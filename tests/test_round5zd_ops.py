"""Round-5 batch-32 operators on crafted inputs, verified against
independent Python computations: delta_agg_maintenance (monoid-merge
identity), lw_shrinkage_plan (Ledoit-Wolf intensity vs a from-scratch
numpy computation), packing_lower_bound (Martello-Toth L2 vs brute
arithmetic)."""

from __future__ import annotations

import math

import numpy as np

from pdf_extractor_spark.queries import (
    _PACK_BUDGET,
    _PACK_LB_GRID,
    q_delta_agg_maintenance,
    q_lw_shrinkage_plan,
    q_packing_lower_bound,
)


def _write_docs_nchars(spark, path, rows):
    """rows: (doc_id, source, n_chars)."""
    spark.createDataFrame(
        [(i, "x", "en", s, n) for i, s, n in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_tokens(spark, path, rows):
    """rows: (source, n_tokens) -> text of that many words."""
    spark.createDataFrame(
        [(i, "w " * n, "en", s, 2 * n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, mat):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(mat)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


# ------------------------------------------------------- delta_agg_maintenance


def test_delta_agg_identity_holds(spark, tmp_path):
    rows = [(i, "a", 100 + 7 * i) for i in range(1, 21)]
    rows += [(100 + i, "b", 5000 - 31 * i) for i in range(1, 11)]
    rows += [(200 + 5 * i, "c", 42) for i in range(1, 4)]  # ids 205,210,215
    _write_docs_nchars(spark, tmp_path, rows)
    out = {r["source"]: r
           for r in q_delta_agg_maintenance(spark, str(tmp_path)).collect()}
    assert set(out) == {"a", "b", "c"}
    for s in out:
        vals = [n for _, src, n in rows if src == s]
        r = out[s]
        assert r["states_match"] == 1
        assert r["n_full"] == len(vals)
        mean = sum(vals) / len(vals)
        var = sum(v * v for v in vals) / len(vals) - mean * mean
        assert r["mean_full"] == round(mean, 4)
        assert r["var_full"] == round(var, 4)
        assert r["mean_merged"] == r["mean_full"]
        assert r["var_merged"] == r["var_full"]
        assert r["min_full"] == min(vals)
        assert r["max_full"] == max(vals)
    # source c sits ENTIRELY in the arrival slice (ids all % 5 == 0):
    # single-part merge must still reproduce the full stats
    assert out["c"]["n_full"] == 3 and out["c"]["states_match"] == 1


# ----------------------------------------------------------- lw_shrinkage_plan


def _lw_py(mat):
    x = np.asarray(mat, dtype=np.float32).astype(np.float64)
    n, d = x.shape
    xc = x - x.mean(axis=0)
    s = xc.T @ xc / n
    mu = float(np.trace(s)) / d
    frob_s2 = float((s * s).sum())
    d2 = frob_s2 - d * mu * mu
    q = float(((xc * xc).sum(axis=1) ** 2).sum())
    bbar2 = q / (n * n) - frob_s2 / n
    b2 = min(max(bbar2, 0.0), max(d2, 0.0))
    lam = 1.0 if d2 <= 0 else min(1.0, b2 / d2)
    return {
        "n_vecs": n, "dim": d, "mu": round(mu, 4), "d2": round(d2, 4),
        "bbar2": round(bbar2, 4), "shrinkage_lambda": round(lam, 4),
    }


def test_lw_matches_numpy_reference(spark, tmp_path):
    rng_free = [[((i * 37 + j * 11) % 19) / 4.0 - 2.0 for j in range(6)]
                for i in range(40)]
    _write_embeddings(spark, tmp_path, rng_free)
    want = _lw_py(rng_free)
    r = q_lw_shrinkage_plan(spark, str(tmp_path)).collect()[0]
    for k2, v in want.items():
        assert r[k2] == v, (k2, r[k2], v)
    assert 0.0 <= r["shrinkage_lambda"] <= 1.0


def test_lw_degenerate_identical_vectors(spark, tmp_path):
    _write_embeddings(spark, tmp_path, [[1.0, 2.0, 3.0, 4.0]] * 10)
    r = q_lw_shrinkage_plan(spark, str(tmp_path)).collect()[0]
    assert r["d2"] == 0.0           # S == 0 -> no structure to preserve
    assert r["shrinkage_lambda"] == 1.0


def test_lw_few_samples_high_shrinkage(spark, tmp_path):
    # 3 samples in 8 dims: sample covariance is mostly noise -> high lam
    mat = [[float((i * 13 + j * 7) % 11) for j in range(8)]
           for i in range(3)]
    _write_embeddings(spark, tmp_path, mat)
    want = _lw_py(mat)
    r = q_lw_shrinkage_plan(spark, str(tmp_path)).collect()[0]
    assert r["shrinkage_lambda"] == want["shrinkage_lambda"]
    assert r["shrinkage_lambda"] > 0.3


# --------------------------------------------------------- packing_lower_bound


def _pack_lb_py(rows):
    c = _PACK_BUDGET
    lens = [min(n, c) for _, n in rows]
    out = {}
    for t in _PACK_LB_GRID:
        large = [x for x in lens if x > c - t]
        mid = [x for x in lens if t <= x <= c - t]
        n_large, large_mass, mid_mass = len(large), sum(large), sum(mid)
        l2 = n_large + max(
            0, math.ceil((mid_mass - (n_large * c - large_mass)) / c))
        out[t] = {"n_large_items": n_large, "mid_token_mass": mid_mass,
                  "l2_bound": l2}
    l1 = math.ceil(sum(lens) / c)
    per_src: dict[str, int] = {}
    for s, n in rows:
        per_src[s] = per_src.get(s, 0) + min(n, c)
    measured = sum(math.ceil(v / c) for v in per_src.values())
    best = max(v["l2_bound"] for v in out.values())
    return out, l1, measured, best


def test_packing_lb_matches_arithmetic(spark, tmp_path):
    rows = [("a", 1100), ("a", 1100), ("a", 1100), ("b", 600),
            ("b", 100), ("b", 3000)]  # 3000 clamps to the 2048 budget
    _write_docs_tokens(spark, tmp_path, rows)
    want, l1, measured, best = _pack_lb_py(rows)
    got = {r["half_threshold"]: r
           for r in q_packing_lower_bound(spark, str(tmp_path)).collect()}
    assert set(got) == set(_PACK_LB_GRID)
    for t, w in want.items():
        r = got[t]
        for k2, v in w.items():
            assert r[k2] == v, (t, k2, r[k2], v)
        assert r["l1_bound"] == l1
        assert r["packer_sequences"] == measured
        assert r["best_lower_bound"] == best
        assert r["n_docs"] == len(rows)
    # the crafted 3x1100 case: count bound beats the mass bound
    assert best > l1


def test_packing_lb_valid_bound_and_tight_when_exact(spark, tmp_path):
    # docs of exactly half the budget pack perfectly two-per-sequence
    rows = [("a", _PACK_BUDGET // 2)] * 8
    _write_docs_tokens(spark, tmp_path, rows)
    out = q_packing_lower_bound(spark, str(tmp_path)).collect()
    r = out[0]
    assert r["l1_bound"] == 4
    assert r["best_lower_bound"] == 4
    assert r["packer_sequences"] == 4
    # every per-threshold bound is a valid lower bound <= the packer
    assert all(x["l2_bound"] <= x["packer_sequences"] for x in out)
