"""AQE runtime-replan pins — the north rule's "skew handled explicitly"
has two legs: the explicit operators (salted_join, skew_salt_plan) and
Spark's own adaptive skew-join split, which the session enables
(session.py: adaptive.enabled/skewJoin.enabled).  These tests prove the
second leg actually fires under this session's config — a skewed shuffle
partition is split at runtime (SortMergeJoin(skew=true)) and undersized
shuffle partitions are coalesced — so the claim in SURVEY/DEPLOYMENT is
pinned behavior, not configuration hope."""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F

_TUNED = {
    # detection thresholds scaled down so test-sized data exhibits the
    # same runtime re-plan a 100-TB skewed join gets at defaults
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
}


@contextmanager
def _tuned_conf(spark, overrides):
    old = {}
    for k, v in overrides.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )


def test_aqe_splits_skewed_join_partition(spark):
    """One key holds 75% of the left side: AQE must detect the skewed
    shuffle partition from runtime map stats and split it, marking the
    join skew=true — no salting, no hints, no manual repartition."""
    with _tuned_conf(spark, _TUNED):
        left = spark.range(0, 200000, 1, 8).select(
            F.when(F.col("id") < 150000, 0).otherwise(F.col("id") % 100)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k").select("k", "pad", "d")
        assert len(j.collect()) == 200000  # collect() executes THIS plan
        final = _final_plan(j)
        assert "isFinalPlan=true" in final
        assert "skew=true" in final
        assert "skewed" in final  # AQEShuffleRead ... skewed


def test_aqe_coalesces_undersized_shuffle_partitions(spark):
    """A tiny aggregate under 8 shuffle partitions: AQE's runtime stats
    coalesce the undersized partitions instead of running 8 near-empty
    reducers — the config every operator in this repo inherits."""
    df = (
        spark.range(0, 1000, 1, 8)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    assert len(df.collect()) == 10
    final = _final_plan(df)
    assert "isFinalPlan=true" in final
    assert "AQEShuffleRead" in final
    assert "coalesced" in final
