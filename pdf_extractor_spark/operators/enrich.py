"""Stage 3 — embeddings and multiplexed-output splitting.

Embeddings: deterministic stub (core/embed.py) computed per chunk BEFORE
the sink append, preserving the reference's no-orphan all-or-nothing
contract — a chunk row never lands without its vector
(/root/reference/api.py:1360-1380, HOW_THIS_WORKS.md:313-315).

Splitters turn the stage-2 multiplexed table (chunk rows + sentinel doc
rows, see operators/chunk.py) back into the `chunks` / `documents` /
`lineage` relations.  They run on the *written* parquet, so the expensive
extract+chunk computation executes exactly once per batch.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import EMBED_DIM
from ..core.embed import embed_batch
from .chunk import CHUNK_COLS, SENTINEL_INDEX


@lru_cache(maxsize=2)
def embed_udf(packed: bool = False):
    """Lazy: pandas_udf DDL parsing needs an active SparkSession.

    ``packed=True`` emits the vector as a single ``binary`` cell
    (little-endian float32, 4·EMBED_DIM bytes) instead of
    ``array<float>``.  Same bytes of signal, but the packed column skips
    per-element Arrow offsets and parquet list encoding — measurably
    lighter on the memory subsystem in the embed+sink tail (the schema-v2
    path for throughput-critical runs; see BENCH.md).  Unpack with
    ``unpack_embeddings`` or ``numpy.frombuffer(cell, dtype='<f4')``.
    """

    if packed:

        @pandas_udf("binary")
        def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for texts in batches:
                mat = embed_batch(["" if t is None else t for t in texts], EMBED_DIM)
                out = [
                    None if t is None else mat[i].tobytes()
                    for i, t in enumerate(texts)
                ]
                yield pd.Series(out)

        return _udf

    @pandas_udf("array<float>")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            mat = embed_batch(["" if t is None else t for t in texts], EMBED_DIM)
            out = [None if t is None else mat[i] for i, t in enumerate(texts)]
            yield pd.Series(out)

    return _udf


def add_embeddings(
    df: DataFrame, text_col: str = "content", packed: bool | None = None
) -> DataFrame:
    if packed is None:
        from ..config import EMBED_PACKED

        packed = EMBED_PACKED
    return df.withColumn("embedding", embed_udf(packed)(F.col(text_col)))


@lru_cache(maxsize=1)
def _unpack_udf():
    import numpy as np

    @pandas_udf("array<float>")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for blobs in batches:
            yield pd.Series(
                [
                    None if b is None else np.frombuffer(b, dtype="<f4")
                    for b in blobs
                ]
            )

    return _udf


def unpack_embeddings(df: DataFrame, col: str = "embedding") -> DataFrame:
    """binary (packed float32) → array<float> — the schema-v2 read adapter."""
    return df.withColumn(col, _unpack_udf()(F.col(col)))


def split_chunks(multiplexed: DataFrame) -> DataFrame:
    return multiplexed.where(F.col("chunk_index") != SENTINEL_INDEX).select(
        *CHUNK_COLS, *( ["embedding"] if "embedding" in multiplexed.columns else [] )
    )


def split_documents(multiplexed: DataFrame) -> DataFrame:
    """Sentinel rows → documents(conv_id, title, num_turns, chunk_count,
    status).  chunk_count derives from the chunk rows of the same table —
    a count over already-materialised parquet, not a recompute."""
    sentinels = multiplexed.where(F.col("chunk_index") == SENTINEL_INDEX).select(
        "conv_id", "title", "num_turns", "status"
    )
    counts = (
        multiplexed.where(F.col("chunk_index") != SENTINEL_INDEX)
        .groupBy("conv_id")
        .agg(F.count("*").cast("int").alias("chunk_count"))
    )
    return sentinels.join(counts, "conv_id", "left").select(
        "conv_id",
        "title",
        "num_turns",
        F.coalesce("chunk_count", F.lit(0)).cast("int").alias("chunk_count"),
        "status",
    )


def batch_lineage(multiplexed: DataFrame) -> DataFrame:
    """Counter roll-up for one batch (north rule: turns in/out, bytes
    parsed, parse failures) — computed from sentinel rows, so the counters
    are exactly-once per committed batch like the reference's verified
    ``affected_rows`` (api.py:1417-1445)."""
    sentinels = multiplexed.where(F.col("chunk_index") == SENTINEL_INDEX)
    chunk_rows = multiplexed.where(F.col("chunk_index") != SENTINEL_INDEX)
    a = sentinels.agg(
        F.count("*").alias("convs"),
        F.sum("num_turns").alias("turns_in"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("parse_failures").alias("parse_failures"),
        F.sum("struct_warnings").alias("struct_warnings"),
        F.sum((F.col("status") != "embedded").cast("int")).alias("convs_rejected"),
    )
    b = chunk_rows.agg(
        F.count("*").alias("chunks_out"),
        F.sum("char_count").alias("chars_out"),
    )
    return a.crossJoin(b)
