"""Bucketed-table co-location plan contracts: joins and aggregates on the
bucket key must plan WITHOUT an Exchange on the bucketed side(s) — the
declared-at-write-time shuffle elimination the 100-TB posture relies on
(DEPLOYMENT.md / plans/bucketed.py)."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.plans.bucketed import (
    drop_table,
    read_table,
    write_bucketed,
)
from pdf_extractor_spark.sources.transcripts import transcripts_spark_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    tx = transcripts_spark_df(spark, 30, seed=42)
    convs = tx.groupBy("conv_id").count().withColumnRenamed("count", "n_turns")
    write_bucketed(tx, "bt_turns", "conv_id", 8)
    write_bucketed(convs, "bt_convs", "conv_id", 8)
    yield "bt_turns", "bt_convs"
    drop_table(spark, "bt_turns")
    drop_table(spark, "bt_convs")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """bucketed ⋈ bucketed on the bucket key: zero Exchange anywhere —
    both scans read bucket-aligned splits straight into the join.  The
    merge hint forces the sort-merge path: on these tiny test tables AQE
    would otherwise broadcast, which hides exactly the exchange this test
    exists to rule out at scale (broadcast stops being an option long
    before 100 TB).  A per-task Sort remains: Spark only trusts sortBy
    order when each bucket is a single file, and parallel writers emit
    one file per (task, bucket) — the sort is bucket-local and cheap; the
    Exchange is what bucketing is for."""
    t, c = bucketed_tables
    joined = read_table(spark, t).hint("merge").join(
        read_table(spark, c), "conv_id"
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2


def test_bucketed_groupby_key_has_no_exchange(spark, bucketed_tables):
    """Aggregating the bucketed table BY its bucket key needs no shuffle:
    partial and final aggregate run in one stage over bucket splits."""
    t, _ = bucketed_tables
    agg = read_table(spark, t).groupBy("conv_id").count()
    assert "Exchange" not in _plan(agg)


def test_unbucketed_probe_side_shuffles_only_itself(spark, bucketed_tables):
    """Joining a NON-bucketed frame against the bucketed table shuffles
    only the non-bucketed side (one Exchange, not two)."""
    t, _ = bucketed_tables
    probe = transcripts_spark_df(spark, 5, seed=7).groupBy("conv_id").count()
    joined = read_table(spark, t).join(probe, "conv_id")
    plan = _plan(joined)
    assert plan.count("Exchange hashpartitioning") == 1


def test_path_read_loses_bucket_spec(spark, bucketed_tables):
    """Guard for the silent-regression trap the module docstring warns
    about: reading the SAME files by path (not via the catalog) discards
    the bucket spec and the join shuffles both sides again."""
    t, c = bucketed_tables
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {t}")
        .where("col_name = 'Location'")
        .first()["data_type"]
    )
    by_path = spark.read.parquet(loc)
    joined = by_path.join(read_table(spark, c), "conv_id")
    assert "Exchange" in _plan(joined)


def test_bucketed_join_values_match_shuffled_join(spark, bucketed_tables):
    """Co-location is a plan property, not a semantics change: the
    bucketed join must return exactly the rows of the plain shuffled
    join."""
    t, c = bucketed_tables
    got = (
        read_table(spark, t)
        .join(read_table(spark, c), "conv_id")
        .groupBy("conv_id")
        .count()
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    tx = transcripts_spark_df(spark, 30, seed=42)
    convs = tx.groupBy("conv_id").count().withColumnRenamed("count", "n_turns")
    want = (
        tx.join(convs, "conv_id")
        .groupBy("conv_id")
        .count()
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
