"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship run: full extraction pipeline (stage-1 pandas-UDF
               layout/normalize/XSS, stage-2 per-conversation chunk fold,
               embeddings) over a deterministic synthetic transcripts table
               at golden-corpus scale; returns the chunk DataFrame.
``queries``  — one entry per implemented operator (SURVEY.md §2 + the
               training-data operator families), every entry except the
               iterative Lloyd k-means carrying a DuckDB oracle; derived
               directly from pdf_extractor_spark/queries.QUERY_REGISTRY.
``oracle_sql`` — DuckDB-parity SQL for every SQL-expressible query; only
               the iterative Lloyd k-means entry is rows-only (its
               exactness is pinned vs a numpy reference in
               tests/test_kmeans.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.queries import QUERY_REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → extracted, chunked, embedded chunk rows."""
    from pdf_extractor_spark.operators.enrich import split_chunks
    from pdf_extractor_spark.plans.pipeline import build_multiplexed
    from pdf_extractor_spark.sources.transcripts import transcripts_spark_df

    transcripts = transcripts_spark_df(spark, n_convs=20, seed=42, skew_every=20)
    return split_chunks(build_multiplexed(transcripts))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERY_REGISTRY.items() if sql}
