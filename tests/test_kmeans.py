"""IVF index build (deterministic Lloyd k-means): the Spark implementation
must reproduce a pure-numpy reference EXACTLY (no RNG, fixed seeds, fixed
iterations), feed q_ivf_multiprobe as its centroid side table, and keep the
scale plan (broadcast assignment map-side, one Arrow shuffle per iteration,
no dim-explode)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    _KMEANS_ITERS,
    _KMEANS_K,
    _t,
    kmeans_centroids,
    q_ivf_multiprobe,
    q_kmeans_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_lloyd(vecs: np.ndarray, vec_ids: np.ndarray, k: int, iters: int):
    """Reference implementation mirroring kmeans_centroids' spec."""
    order = np.argsort(vec_ids)
    vecs, vec_ids = vecs[order], vec_ids[order]
    cents = vecs[:k].astype(np.float64).copy()
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    normed = vecs.astype(np.float64)
    normed /= np.maximum(np.linalg.norm(normed, axis=1, keepdims=True), 1e-30)
    for _ in range(iters):
        cid = np.argmax(normed @ cents.T, axis=1)
        new = cents.copy()
        for c in range(k):
            members = vecs[cid == c]
            if len(members):
                new[c] = members.astype(np.float64).mean(axis=0)
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-30)
        cents = new
    return cents


@pytest.fixture(scope="module")
def emb_pdf(spark):
    return _t(spark, SF_DIR, "embeddings").select("vec_id", "embedding").toPandas()


def test_spark_kmeans_equals_numpy_reference(spark, emb_pdf):
    got = (
        kmeans_centroids(_t(spark, SF_DIR, "embeddings"))
        .toPandas()
        .sort_values("cid")
        .reset_index(drop=True)
    )
    vecs = np.stack(emb_pdf["embedding"].to_numpy())
    want = _numpy_lloyd(
        vecs, emb_pdf["vec_id"].to_numpy(), _KMEANS_K, _KMEANS_ITERS
    )
    assert list(got["cid"]) == list(range(_KMEANS_K))
    np.testing.assert_allclose(
        np.stack(got["centroid"].to_numpy()), want, rtol=0, atol=1e-12
    )


def test_kmeans_is_deterministic_across_runs(spark):
    emb = _t(spark, SF_DIR, "embeddings")
    a = kmeans_centroids(emb).toPandas().sort_values("cid").reset_index(drop=True)
    b = (
        kmeans_centroids(emb.repartition(7))  # partitioning must not matter
        .toPandas().sort_values("cid").reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        np.stack(a["centroid"].to_numpy()), np.stack(b["centroid"].to_numpy())
    )


def test_kmeans_catalog_row_shape(spark):
    out = q_kmeans_centroids(spark, SF_DIR).toPandas()
    assert set(out.columns) == {"cid", "n_members", "centroid_norm"}
    assert out["n_members"].sum() == len(
        _t(spark, SF_DIR, "embeddings").toPandas()
    )
    # unit-normalized centroids
    assert (out["centroid_norm"] == 1.0).all()


def test_kmeans_centroids_drive_multiprobe(spark):
    """The built index plugs into q_ivf_multiprobe as its side table: the
    query must run and return k-limited probed results (the cell geometry
    differs from the synthetic 'label' column, so rows may differ — shape
    and validity are the contract here)."""
    cents = kmeans_centroids(_t(spark, SF_DIR, "embeddings")).withColumnRenamed(
        "cid", "label"
    )
    out = q_ivf_multiprobe(spark, SF_DIR, centroids=cents)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert {r["vec_id"] for r in rows}.isdisjoint({0})  # query vec excluded


def test_kmeans_plan_no_explode_one_shuffle_per_iteration(spark):
    """Each Lloyd iteration: assignment map-side (ArrowEvalPython before any
    exchange) + one grouped Arrow shuffle. Nothing may posexplode."""
    emb = _t(spark, SF_DIR, "embeddings")
    import pyspark.sql.functions as F  # noqa: F401  (parity with queries.py)
    from pdf_extractor_spark.queries import kmeans_centroids as kc

    # capture the per-iteration plan by rebuilding the first update step
    import numpy as np
    seeds = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).toPandas()
    cents = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast(cents)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(embedding: pd.Series) -> pd.Series:
        m = np.stack(embedding.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype("int32"))

    def cluster_mean(g: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"cid": [int(g["cid"].iloc[0])],
                             "centroid": [m.mean(axis=0)]})

    step = (
        emb.select("vec_id", "embedding")
        .withColumn("cid", assign("embedding"))
        .groupBy("cid")
        .applyInPandas(cluster_mean, "cid int, centroid array<double>")
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan          # no posexplode
    assert plan.count("Exchange") == 1     # exactly the grouped Arrow shuffle
    assert "FlatMapGroupsInPandas" in plan
    assert "ArrowEvalPython" in plan       # assignment runs map-side


def test_kmeans_with_fewer_vectors_than_cells(spark, tmp_path):
    """k clamps to the vector count — 3 vectors, k=8 → 3 cells, no crash."""
    import os

    import pandas as pd

    emb = _t(spark, SF_DIR, "embeddings").limit(3).toPandas()
    p = str(tmp_path)
    spark.createDataFrame(emb).write.parquet(os.path.join(p, "embeddings.parquet"))
    out = kmeans_centroids(_t(spark, p, "embeddings")).toPandas()
    assert len(out) == 3
    assert sorted(out["cid"]) == [0, 1, 2]


def test_kmeans_materializes_under_arrow_disabled_session(spark):
    """Driver-parity regression for the round-3 red row: the external
    correctness driver runs WITHOUT spark.sql.execution.arrow.pyspark
    .enabled, whose createDataFrame path type-verifies local rows and
    rejects numpy scalars (PySparkTypeError FIELD_DATA_TYPE_UNACCEPTABLE).
    Both the raw centroid table and the catalog entry must materialize
    with Arrow off and match the Arrow-on values exactly."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    emb = _t(spark, SF_DIR, "embeddings")
    with_arrow = kmeans_centroids(emb).toPandas().sort_values("cid")
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        raw = kmeans_centroids(emb).toPandas().sort_values("cid")
        cat = q_kmeans_centroids(spark, SF_DIR).toPandas()
    finally:
        spark.conf.set(key, prev)
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in raw["centroid"]]),
        np.stack([np.asarray(c) for c in with_arrow["centroid"]]),
    )
    assert len(cat) == _KMEANS_K and (cat["centroid_norm"] == 1.0).all()


def test_kmeans_tol_default_is_bitwise_identical_and_early_stop_works(spark):
    """tol=0.0 (default) must never stop early — bit-identical to the
    fixed-iteration round-3 behavior; a huge tol stops after the first
    update, matching the numpy reference at iters=1."""
    emb = _t(spark, SF_DIR, "embeddings")
    base = kmeans_centroids(emb).toPandas().sort_values("cid")
    default_tol = kmeans_centroids(emb, tol=0.0).toPandas().sort_values("cid")
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in base["centroid"]]),
        np.stack([np.asarray(c) for c in default_tol["centroid"]]),
    )
    one_iter = (
        kmeans_centroids(emb, iters=1).toPandas().sort_values("cid")
    )
    early = (
        kmeans_centroids(emb, iters=50, tol=1e9).toPandas().sort_values("cid")
    )
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in early["centroid"]]),
        np.stack([np.asarray(c) for c in one_iter["centroid"]]),
    )
