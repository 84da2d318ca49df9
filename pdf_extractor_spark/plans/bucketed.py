"""Bucketed-table co-location: the shuffle-free join/aggregate path.

At 100 TB the dominant cost of every ``conv_id`` join and of the stage-2
``groupBy(conv_id)`` chunk fold is the exchange.  Spark's native bucketing
removes it: a table written with ``bucketBy(n, key)`` records the bucket
spec in the catalog, and any join/aggregate keyed on ``key`` between
tables with compatible bucket counts reads bucket-aligned file splits
with NO Exchange on the bucketed side(s) — the cluster-scale analog of
the reference's single-process "everything is already local" assumption
(reference: api.py:1258-1290 upserts into one Postgres, where
co-location is implicit; here it must be declared at write time).

Posture for the 10^12-turn corpus: bucket the canonical transcripts table
by ``conv_id`` ONCE at ingest (buckets ≈ cluster cores × small factor);
every downstream stage — extraction's turn regroup, the chunk fold, the
chunk↔document joins, reject anti-joins — then plans bucket-local.  The
one-time bucketing shuffle is amortized over every subsequent job.

Plan shape is pinned by tests/test_bucketed.py: bucketed⋈bucketed on the
bucket key has zero Exchange; bucketed groupBy(key) aggregates with zero
Exchange; a non-bucketed probe side still shuffles ONLY itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "drop_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and by default sorted)
    by ``key`` into ``buckets`` buckets.

    ``sort=True`` additionally sorts within each bucket file, which lets
    sort-merge joins skip the per-task sort as well (SortMergeJoin with
    neither Exchange nor Sort below it).  Bucket counts on the two sides
    of a join must be equal or integer multiples (Spark requirement)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (``spark.table``,
    not ``spark.read.parquet`` on the files — a path read discards the
    bucket metadata and silently reintroduces the shuffle)."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
