"""Stage 1 — per-turn extraction as a vectorized pandas UDF.

One Arrow batch of raw turn texts in, one batch of extraction structs out.
The UDF body is ``core.oracle.extract_turn_fields`` — the exact function
that generates the goldens — so Spark output equals the goldens by
construction (modulo Arrow round-trip, which the parity tests pin down).

Reference lineage: the UDF composes L1-L7 layout parse
(/root/reference/pdf_extractor.py:275-326), N1-N3 normalize/sanitize
(api.py:720-766, 353-381) and the F4/F5 injection screens (api.py:384-472).
Iterator form (`Iterator -> Iterator`) amortises the regex-compile and
import cost once per Python worker, not once per batch — the difference is
measurable at 10^12 turns.

``first_extract`` (the pre-normalize layout text, title-inference input,
api.py:1314-1319) is emitted ONLY for turn_idx == 0: carrying it for every
turn would roughly double stage-1→stage-2 shuffle bytes to serve one row
per conversation.

No per-row Python outside the Arrow batch loop; no driver-side collects.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..core.oracle import extract_turn_fields

EXTRACT_STRUCT_SCHEMA = (
    "clean_text: string, printed_page: string, chapter: string, "
    "char_count: int, parse_ok: boolean, rejected_xss: boolean, "
    "struct_warn: int, bytes_in: long, first_extract: string"
)

_FIELD_ORDER = [
    "clean_text",
    "printed_page",
    "chapter",
    "char_count",
    "parse_ok",
    "rejected_xss",
    "struct_warn",
    "bytes_in",
    "first_extract",
]


def _extract_batch(texts: pd.Series, turn_idxs: pd.Series) -> pd.DataFrame:
    rows = []
    for raw, idx in zip(texts, turn_idxs):
        fields = extract_turn_fields(raw)
        extracted = fields.pop("extracted_text")
        fields["first_extract"] = extracted if idx == 0 else None
        fields["bytes_in"] = len(raw) if isinstance(raw, str) else 0
        rows.append(fields)
    out = pd.DataFrame(rows, columns=_FIELD_ORDER)
    out["char_count"] = out["char_count"].astype("int32")
    out["struct_warn"] = out["struct_warn"].astype("int32")
    out["bytes_in"] = out["bytes_in"].astype("int64")
    return out


@lru_cache(maxsize=1)
def extract_turn_udf():
    """Lazy: pandas_udf DDL parsing needs an active SparkSession."""

    @pandas_udf(EXTRACT_STRUCT_SCHEMA)
    def _udf(
        batches: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        for texts, turn_idxs in batches:
            yield _extract_batch(texts, turn_idxs)

    return _udf


def extraction_col(text_col: str = "text", turn_idx_col: str = "turn_idx") -> Column:
    return extract_turn_udf()(F.col(text_col), F.col(turn_idx_col))


@lru_cache(maxsize=1)
def tables_udf():
    """S4 table extraction as its OWN pandas UDF (not folded into the
    extraction struct): SURVEY.md P1 — Catalyst prunes a whole unused UDF
    column, so `include_tables=False` is literally "don't select it" and
    the table pass never runs (reference fast path api.py:1993-2004)."""
    from ..core.tables import detect_tables

    @pandas_udf("array<array<array<string>>>")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series(
                [detect_tables(t if isinstance(t, str) else "") for t in texts]
            )

    return _udf


def with_tables(df: DataFrame, text_col: str = "text") -> DataFrame:
    """transcripts → + tables:array<array<array<string>>> + num_tables.

    Reference: extract_tables + per-page table count
    (/root/reference/pdf_extractor.py:419-460, :456).
    """
    return df.withColumn("tables", tables_udf()(F.col(text_col))).withColumn(
        "num_tables", F.size("tables")
    )


def extract_turns(df: DataFrame, with_first_extract: bool = False) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → extracted turns.

    Output: (conv_id, turn_idx, clean_text, printed_page, chapter,
    char_count, parse_ok, rejected_xss, bytes_in[, first_extract]).  Narrow
    projection first so Catalyst prunes unused input columns at the scan
    (role/tool/ts never cross into Python unless the caller asks).
    """
    cols = ["conv_id", "turn_idx", "x.*"]
    out = (
        df.select("conv_id", "turn_idx", extraction_col().alias("x"))
        .select(*cols)
    )
    if not with_first_extract:
        out = out.drop("first_extract")
    return out
