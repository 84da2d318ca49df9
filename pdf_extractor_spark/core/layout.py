"""Virtual-page layout parse: tokenize → header → columns → lines → cleanup.

The reference engine reads positioned words from pdfplumber pages and
reconstructs reading order (/root/reference/pdf_extractor.py:275-326).
Transcript turns carry flat text, so this module first *synthesises* word
positions on a fixed character grid (one char = ``CHAR_WIDTH_PX`` px, one
line = ``LINE_HEIGHT_PX`` px — see config.py), then applies the reference's
geometry algorithms unchanged:

* column detection via 5 px left-edge histogram .. pdf_extractor.py:66-147
* line reconstruction (y-round sort, 4 pt merge) .. pdf_extractor.py:150-177
* header page-number/chapter parse + corner scan .. pdf_extractor.py:180-272
* page assembly + cleanup ordering              .. pdf_extractor.py:275-326

The same functions execute as the single-process oracle (golden generation)
and inside Arrow-batched pandas UDFs (operators/extract.py), which is what
guarantees byte-for-byte per-turn text equality.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

from ..config import (
    CHAR_WIDTH_PX,
    COL_BUCKET_PX,
    COL_MIN_GAP_PX,
    COL_MIN_WIDTH_PX,
    FOOTER_BAND_PX,
    HEADER_BAND_PT,
    LINE_HEIGHT_PX,
    LINE_Y_TOLERANCE,
    PAGE_BOTTOM_PAD,
    PAGE_X_MARGIN,
    PAGE_Y_MARGIN,
)
from .textnorm import drop_footer_lines, repair_hyphenation, substitute_cids


class Word(NamedTuple):
    """A positioned token — the pdfplumber word-dict analog."""

    x0: float
    x1: float
    top: float
    text: str


_TOKEN = re.compile(r"\S+")
_CHAPTER_PAGE_NUM = re.compile(r"^\d{1,3}-\d{1,4}$")
_PLAIN_PAGE_NUM = re.compile(r"^\d{1,3}$")


class VirtualPage(NamedTuple):
    words: list[Word]
    width: float
    height: float


def tokenize_turn(raw: str) -> VirtualPage:
    """Lay a turn's flat text onto the virtual character grid.

    Line *i*, character column *c* → ``top = PAGE_Y_MARGIN + i*LINE_HEIGHT_PX``,
    ``x0 = PAGE_X_MARGIN + c*CHAR_WIDTH_PX``.  A gutter of ≥ ~10 aligned blank
    character columns across all lines therefore reads as a real column gap to
    the reference histogram (COL_BUCKET_PX/COL_MIN_GAP_PX are in the same px
    space).  Deterministic: same text → same geometry.
    """
    rows = raw.split("\n")
    words: list[Word] = []
    # hot path (≈1/3 of stage-1 CPU): locals + inline max avoid a second
    # full pass and repeated global lookups; numerically identical
    append = words.append
    finditer = _TOKEN.finditer
    max_x1 = 0.0
    for i, row in enumerate(rows):
        top = PAGE_Y_MARGIN + i * LINE_HEIGHT_PX
        for m in finditer(row):
            x0 = PAGE_X_MARGIN + m.start() * CHAR_WIDTH_PX
            x1 = PAGE_X_MARGIN + m.end() * CHAR_WIDTH_PX
            if x1 > max_x1:
                max_x1 = x1
            append(Word(x0, x1, top, m.group()))
    width = max_x1 + PAGE_X_MARGIN
    height = PAGE_Y_MARGIN + len(rows) * LINE_HEIGHT_PX + PAGE_BOTTOM_PAD
    return VirtualPage(words, max(width, 612.0), height)


def detect_columns(words: list[Word], page_width: float) -> list[tuple[float, float]]:
    """Histogram word left-edges into 5 px buckets; empty runs ≥ 5 px are
    column gaps; resulting columns narrower than 50 px are discarded.

    Parity: pdf_extractor.py:66-147, including the first/last edge extension
    (±1 px) and the single-full-width fallback.
    """
    if not words:
        return [(0.0, page_width)]

    # single pass: bucket counts + true extremes together (three separate
    # min/max sweeps measured ~15% of this function); same values
    counts: dict[int, int] = {}
    true_lo = words[0].x0
    true_hi = words[0].x1
    for w in words:
        x0 = w.x0
        if x0 < true_lo:
            true_lo = x0
        if w.x1 > true_hi:
            true_hi = w.x1
        b = int(x0 // COL_BUCKET_PX) * COL_BUCKET_PX
        counts[b] = counts.get(b, 0) + 1

    lo = min(counts)
    hi = int(true_hi // COL_BUCKET_PX) * COL_BUCKET_PX

    gaps: list[tuple[int, int]] = []
    run_start: Optional[int] = None
    for bx in range(lo, hi + COL_BUCKET_PX, COL_BUCKET_PX):
        if counts.get(bx, 0) == 0:
            if run_start is None:
                run_start = bx
        elif run_start is not None:
            if bx - run_start >= COL_MIN_GAP_PX:
                gaps.append((run_start, bx))
            run_start = None
    if run_start is not None and (hi + COL_BUCKET_PX) - run_start >= COL_MIN_GAP_PX:
        gaps.append((run_start, hi + COL_BUCKET_PX))

    if not gaps:
        return [(float(lo), float(hi + COL_BUCKET_PX))]

    cols: list[tuple[float, float]] = []
    prev = float(lo)
    for gap_start, gap_end in gaps:
        if float(gap_start) - prev >= COL_MIN_WIDTH_PX:
            cols.append((prev, float(gap_start)))
        prev = float(gap_end)
    tail_end = float(hi + COL_BUCKET_PX)
    if tail_end - prev >= COL_MIN_WIDTH_PX:
        cols.append((prev, tail_end))

    if not cols:
        return [(float(lo), float(hi + COL_BUCKET_PX))]

    cols[0] = (min(cols[0][0], true_lo - 1), cols[0][1])
    cols[-1] = (cols[-1][0], max(cols[-1][1], true_hi + 1))
    return cols


def words_to_lines(words: list[Word]) -> str:
    """Rebuild reading-order text for one column.

    Sort by (top rounded to the 4 pt grid, x0), then sweep: a word opens a new
    line when its *actual* top differs from the current line's anchor by more
    than the tolerance.  Parity: pdf_extractor.py:150-177 (the rounded-sort /
    exact-compare asymmetry is intentional).
    """
    if not words:
        return ""
    ordered = sorted(
        words, key=lambda w: (round(w.top / LINE_Y_TOLERANCE) * LINE_Y_TOLERANCE, w.x0)
    )
    lines: list[str] = []
    buf: list[str] = []
    anchor: Optional[float] = None
    for w in ordered:
        if anchor is None or abs(w.top - anchor) > LINE_Y_TOLERANCE:
            if buf:
                lines.append(" ".join(buf))
            buf = [w.text]
            anchor = w.top
        else:
            buf.append(w.text)
    if buf:
        lines.append(" ".join(buf))
    return "\n".join(lines)


def _is_year(token: str) -> bool:
    try:
        return 1800 <= int(token) <= 2099
    except ValueError:
        return False


def parse_header(words: list[Word], page_height: float) -> tuple[Optional[str], Optional[str]]:
    """Extract (printed_page, chapter) from the topmost line, with the
    right-corner lone-integer fallback.

    Parity: pdf_extractor.py:180-272.  Rules: chapter-page ``7-5`` always
    wins; a plain integer only if ≤ 3 digits and not a year 1800-2099; the
    first match claims page-number, every other token joins the chapter name.
    """
    if not words:
        return None, None

    min_top = min(w.top for w in words)
    first_line = sorted(
        (w for w in words if w.top <= min_top + HEADER_BAND_PT), key=lambda w: w.x0
    )
    tokens = [substitute_cids(w.text).strip() for w in first_line]

    page_num: Optional[str] = None
    chapter_parts: list[str] = []
    for tok in tokens:
        if not tok:
            continue
        if page_num is None and _CHAPTER_PAGE_NUM.match(tok):
            page_num = tok
            continue
        if page_num is None and _PLAIN_PAGE_NUM.match(tok) and not _is_year(tok):
            page_num = tok
            continue
        chapter_parts.append(tok)
    chapter = " ".join(chapter_parts).strip() or None

    if page_num is None:
        page_w = max((w.x1 for w in words), default=0.0)
        right_edge = page_w * 0.75
        top_band = page_height * 0.08
        bottom_band = page_height * 0.92
        for w in words:
            # position test first: two float compares reject almost every
            # word before the CID-substitution + regex (both conditions are
            # required and iteration order is unchanged, so the SAME word
            # wins — pure reordering of a conjunction)
            if w.x0 < right_edge or (top_band < w.top < bottom_band):
                continue
            tok = substitute_cids(w.text).strip()
            if not _PLAIN_PAGE_NUM.match(tok) or _is_year(tok):
                continue
            page_num = tok
            break

    return page_num, chapter


def extract_page_text(page: VirtualPage) -> tuple[str, Optional[str], Optional[str]]:
    """Full per-turn layout parse → (clean_text, printed_page, chapter).

    Parity: pdf_extractor.py:275-326 — footer-band word mask, header parse on
    *all* words, column detection on content words only, per-column line
    reconstruction (x0 window [col_start-2, col_end+2)), blank-column drop,
    '\\n\\n' column join, then CID → hyphenation → footer-line strip → strip.
    """
    footer_cut = page.height - FOOTER_BAND_PX
    content = [w for w in page.words if w.top < footer_cut]
    if not content:
        return "", None, None

    printed_page, chapter = parse_header(page.words, page.height)

    pieces: list[str] = []
    for col_start, col_end in detect_columns(content, page.width):
        in_col = [w for w in content if col_start - 2 <= w.x0 < col_end + 2]
        text = words_to_lines(in_col)
        if text.strip():
            pieces.append(text)

    raw = "\n\n".join(pieces)
    raw = substitute_cids(raw)
    raw = repair_hyphenation(raw)
    clean = "\n".join(drop_footer_lines(raw.split("\n"))).strip()
    return clean, printed_page, chapter


def extract_turn(raw: str) -> tuple[str, Optional[str], Optional[str]]:
    """Convenience: tokenize + extract in one call (the per-turn hot path)."""
    return extract_page_text(tokenize_turn(raw))
