"""Table extraction from turn text — the S4 operator.

Reference: ``extract_tables`` (/root/reference/pdf_extractor.py:419-460)
asks pdfplumber for per-page tables and emits tables → rows → cells as
``List[List[List[str]]]``, with ``num_tables`` per page
(pdf_extractor.py:456).  pdfplumber infers tables from character positions;
transcript turns carry flat text on this engine's virtual character grid
(core/layout.py), so the equivalent detector finds runs of consecutive
lines whose cells align on the whitespace grid: a *table line* has >= 2
cells separated by a tab or >= 2 spaces; >= 2 consecutive table lines form
one table.  Cells are split on the same separators and stripped, mirroring
pdfplumber's stream-mode row/cell text output.

Pure Python (no Spark imports): this module is both the golden oracle and
the pandas-UDF body, like the rest of ``core``.
"""

from __future__ import annotations

import re

# a cell boundary on the character grid: tab, or a run of >= 2 spaces
_CELL_SEP = re.compile(r"\t+| {2,}")
_MIN_ROWS = 2  # a single aligned line is layout noise, not a table


def split_table_cells(line: str) -> list[str]:
    """Cells of one line under the whitespace-grid rule (stripped,
    empty-edge cells dropped)."""
    return [c for c in (p.strip() for p in _CELL_SEP.split(line)) if c]


def is_table_line(line: str) -> bool:
    """>= 2 grid-aligned cells ⇒ participates in a table candidate."""
    return len(split_table_cells(line)) >= 2


def detect_tables(text: str) -> list[list[list[str]]]:
    """tables → rows → cells for one turn (reference S4 shape).

    Runs of >= MIN_ROWS consecutive table lines become one table each;
    shorter runs are prose with incidental alignment and are ignored.
    """
    if not text:
        return []
    tables: list[list[list[str]]] = []
    run: list[list[str]] = []
    for line in text.split("\n"):
        cells = split_table_cells(line)
        if len(cells) >= 2:
            run.append(cells)
        else:
            if len(run) >= _MIN_ROWS:
                tables.append(run)
            run = []
    if len(run) >= _MIN_ROWS:
        tables.append(run)
    return tables


def table_stats(text: str) -> tuple[int, int, int]:
    """(num_tables, total_rows, total_cells) — the A4/A5 aggregates."""
    tables = detect_tables(text)
    rows = sum(len(t) for t in tables)
    cells = sum(len(r) for t in tables for r in t)
    return len(tables), rows, cells
