"""Round-5 batch-55 operators on crafted inputs, verified against
independent Python computations: embedding_effective_rank (eigen
participation ratio via tr(C)^2/tr(C^2) without eigendecomposition),
sliced_wasserstein_drift (exact per-slice 1-D W1 over int8-code
Rademacher projections), cka_quantization_fidelity (linear CKA between
float embeddings and their SQ8 round-trip)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from pdf_extractor_spark.queries import (
    q_cka_quantization_fidelity,
    q_embedding_effective_rank,
    q_sliced_wasserstein_drift,
)

_D = 64  # embeddings-table dim contract (matches _RP_DIM)


def _write_emb(spark, path, vecs):
    """vecs: list of (vec_id, [floats]) — zero-padded to _D dims."""
    spark.createDataFrame(
        [(i, [float(x) for x in v] + [0.0] * (_D - len(v)), 0)
         for i, v in vecs],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _pad(v):
    return list(v) + [0.0] * (_D - len(v))


# ---------------------------------------------------------------- eff rank

def _eff_rank_ref(mat):
    x = np.asarray(mat, dtype=np.float64)
    cov = x.T @ x / len(x) - np.outer(x.mean(axis=0), x.mean(axis=0))
    var = np.diag(cov)
    tr = float(var.sum())
    fro2 = float((cov * cov).sum())
    diag2 = float((var * var).sum())
    return (tr * tr / fro2, tr * tr / diag2,
            math.sqrt(fro2 / x.shape[1]) / tr)


def test_eff_rank_isotropic_two_dims(spark, tmp_path):
    # 4 points on the axes of a 2-D subspace: cov = diag(.5, .5, 0...)
    vecs = [(0, [1.0, 0.0]), (1, [-1.0, 0.0]),
            (2, [0.0, 1.0]), (3, [0.0, -1.0])]
    _write_emb(spark, tmp_path, vecs)
    r = q_embedding_effective_rank(spark, str(tmp_path)).collect()[0]
    assert r["n_vecs"] == 4 and r["dim"] == _D
    assert r["eff_rank_eigen"] == 2.0
    assert r["eff_rank_diag"] == 2.0
    assert r["corr_redundancy"] == 1.0


def test_eff_rank_correlated_collapse(spark, tmp_path):
    # rank-1 cloud along (1,1): eigen PR = 1 but diag PR = 2
    vecs = [(0, [1.0, 1.0]), (1, [-1.0, -1.0]),
            (2, [2.0, 2.0]), (3, [-2.0, -2.0])]
    _write_emb(spark, tmp_path, vecs)
    r = q_embedding_effective_rank(spark, str(tmp_path)).collect()[0]
    assert r["eff_rank_eigen"] == 1.0
    assert r["eff_rank_diag"] == 2.0
    assert r["corr_redundancy"] == 2.0
    er, ed, lb = _eff_rank_ref([_pad(v) for _, v in vecs])
    assert r["eff_rank_eigen"] == round(er, 2)
    assert r["eff_rank_diag"] == round(ed, 2)
    assert r["top_eig_share_lb"] == round(lb, 4)


def test_eff_rank_general_formula(spark, tmp_path):
    vecs = [(i, [float(i), float(i * i % 5), 3.0 - i, float(i % 2)])
            for i in range(7)]
    _write_emb(spark, tmp_path, vecs)
    r = q_embedding_effective_rank(spark, str(tmp_path)).collect()[0]
    er, ed, lb = _eff_rank_ref([_pad(v) for _, v in vecs])
    assert r["eff_rank_eigen"] == round(er, 2)
    assert r["eff_rank_diag"] == round(ed, 2)
    assert r["corr_redundancy"] == round(ed / er, 4)
    assert r["top_eig_share_lb"] == round(lb, 4)


# ------------------------------------------------------- sliced wasserstein

def _sw_signs():
    return [
        [1 if hashlib.md5(f"sw:{s}:{i}".encode()).digest()[0] % 2 == 0
         else -1 for i in range(_D)]
        for s in range(8)
    ]


def _sw_ref(vecs):
    """Independent sliced-W1: quantize like embedding_int8, project on
    the md5 signs, walk the exact merged-support ECDF integral."""
    signs = _sw_signs()
    mx = max(v for v, _ in vecs)
    proj = {}
    for vid, v in vecs:
        v = _pad(v)
        scale = 127.0 / max(max(abs(x) for x in v), 1e-30)
        codes = [math.floor(x * scale + 0.5) for x in v]
        proj[vid] = [
            sum(c * w for c, w in zip(codes, sg)) / scale for sg in signs
        ]
    out = []
    for s in range(8):
        old = [proj[v][s] for v, _ in vecs if v * 5 <= mx * 4]
        new = [proj[v][s] for v, _ in vecs if v * 5 > mx * 4]
        pts = sorted(set(old + new))
        w1 = 0.0
        for a, b in zip(pts, pts[1:]):
            fa = sum(1 for x in old if x <= a) / len(old)
            fb = sum(1 for x in new if x <= a) / len(new)
            w1 += abs(fa - fb) * (b - a)
        out.append((len(old), len(new), round(w1, 4)))
    return out


def test_sw_identical_distributions_zero(spark, tmp_path):
    # old (ids 0..7) = 4x each of {va, vb}; new (8, 9) = {va, vb}:
    # equal ECDFs on every projection -> W1 = 0 in all 8 slices
    va, vb = [1.0, -2.0, 0.5], [-1.0, 0.25, 2.0]
    vecs = [(i, va if i % 2 == 0 else vb) for i in range(10)]
    _write_emb(spark, tmp_path, vecs)
    rows = q_sliced_wasserstein_drift(spark, str(tmp_path)).collect()
    assert [r["slice"] for r in rows] == list(range(8))
    for r in rows:
        assert r["n_old"] == 8 and r["n_new"] == 2
        assert r["w1_proj"] == 0.0


def test_sw_shift_matches_reference(spark, tmp_path):
    vecs = [(i, [1.0 + 0.1 * i, -0.5 * i, float(i % 3)])
            for i in range(10)]
    _write_emb(spark, tmp_path, vecs)
    rows = q_sliced_wasserstein_drift(spark, str(tmp_path)).collect()
    ref = _sw_ref(vecs)
    assert len(rows) == 8
    for r, (na, nb, w1) in zip(rows, ref):
        assert (r["n_old"], r["n_new"]) == (na, nb)
        assert r["w1_proj"] == w1
    # a pure location shift must register as nonzero transport
    assert any(r["w1_proj"] > 0 for r in rows)


# ----------------------------------------------------------------- CKA/SQ8

def _cka_ref(mat):
    x = np.asarray(mat, dtype=np.float64)
    scale = 127.0 / np.maximum(np.abs(x).max(axis=1), 1e-30)
    y = np.floor(x * scale[:, None] + 0.5) / scale[:, None]
    n = len(x)

    def cov(a, b):
        return a.T @ b / n - np.outer(a.mean(axis=0), b.mean(axis=0))

    cxx, cyy, cxy = cov(x, x), cov(y, y), cov(x, y)
    nxx, nyy = float((cxx ** 2).sum()), float((cyy ** 2).sum())
    nxy = float((cxy ** 2).sum())
    ndiff = float(((cxx - cyy) ** 2).sum())
    dx, dy, dxy = np.diag(cxx), np.diag(cyy), np.diag(cxy)
    dcorr = float(np.mean(
        dxy / np.maximum(np.sqrt(np.maximum(dx * dy, 0.0)), 1e-30)))
    return (nxy / math.sqrt(nxx * nyy),
            math.sqrt(ndiff) / math.sqrt(nxx),
            dcorr,
            float(dy.sum()) / float(dx.sum()))


def test_cka_exactly_representable_is_one(spark, tmp_path):
    # entries in {-1, 0, 1}: scale = 127, codes roundtrip exactly,
    # Y == X -> CKA 1, distortion 0, trace ratio 1; mean_diag_corr
    # averages over ALL 64 dims (zero-variance padded dims contribute
    # 0 by the 1e-30 guard) -> 3/64 active dims with corr 1 each...
    vecs = [(0, [1.0, 0.0, 1.0]), (1, [-1.0, 1.0, 0.0]),
            (2, [0.0, -1.0, -1.0]), (3, [1.0, 1.0, -1.0])]
    _write_emb(spark, tmp_path, vecs)
    r = q_cka_quantization_fidelity(spark, str(tmp_path)).collect()[0]
    assert r["cka_linear"] == 1.0
    assert r["cov_distortion_fro"] == 0.0
    assert r["trace_ratio"] == 1.0
    assert r["mean_diag_corr"] == round(3.0 / _D, 4)


def test_cka_general_matches_reference(spark, tmp_path):
    vecs = [(i, [1.0 + 0.37 * i, -0.71 * i + 0.13,
                 float((i * i) % 7) / 3.0, 0.009 * i])
            for i in range(9)]
    _write_emb(spark, tmp_path, vecs)
    r = q_cka_quantization_fidelity(spark, str(tmp_path)).collect()[0]
    cka, dist, dcorr, tr = _cka_ref([_pad(v) for _, v in vecs])
    assert r["n_vecs"] == 9 and r["dim"] == _D
    assert r["cka_linear"] == round(cka, 4)
    assert r["cov_distortion_fro"] == round(dist, 4)
    assert r["mean_diag_corr"] == round(dcorr, 4)
    assert r["trace_ratio"] == round(tr, 4)
    # SQ8 on a 64-dim space should barely dent the geometry
    assert r["cka_linear"] > 0.999


# -------------------------------------------------------------- plan shapes

def test_plans_single_scan_no_cartesian(spark, tmp_path):
    vecs = [(i, [1.0 + i, float(i % 3), -0.5 * i]) for i in range(6)]
    _write_emb(spark, tmp_path, vecs)
    for fn, max_scans in ((q_embedding_effective_rank, 1),
                          (q_cka_quantization_fidelity, 1),
                          (q_sliced_wasserstein_drift, 2)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= max_scans, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
