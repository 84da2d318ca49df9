"""Round-5 batch-30 operators on crafted inputs, verified against
independent Python computations: lid_mle (Levina-Bickel MLE vs a brute
force reimplementation incl. a closed-form 1-D manifold), ess_weight
diagnostics (Kish ESS + clip sweep vs hand algebra), block_bootstrap
daily CI (vs a sequential Python resampler on the same md5 seeds)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pdf_extractor_spark.queries import (
    _BB_BLOCK_LEN,
    _BB_HI_RANK,
    _BB_LO_RANK,
    _BB_REPS,
    _ESS_CLIP_CAPS,
    _LID_K,
    _LID_SAMPLE_MOD,
    q_block_bootstrap_daily_ci,
    q_ess_weight_diagnostics,
    q_lid_mle,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_embeddings(spark, path, vecs):
    """vecs: {vec_id: list[float]} padded to 8 dims."""
    dim = max(len(v) for v in vecs.values())
    rows = [(i, [float(x) for x in v] + [0.0] * (dim - len(v)), 0)
            for i, v in sorted(vecs.items())]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_docs(spark, path, rows):
    """rows: (source, text)."""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append(
                (eid, _EPOCH + dt.timedelta(days=d, seconds=i), 1,
                 "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# --------------------------------------------------------------------- lid_mle


def _lid_py(vecs):
    """Brute-force Levina-Bickel over the op's exact rules."""
    ids = sorted(vecs)
    qids = [i for i in ids if i % _LID_SAMPLE_MOD == 0]
    lids = []
    for q in qids:
        cand = []
        for j in ids:
            if j == q:
                continue
            d2 = round(sum((a - b) ** 2
                           for a, b in zip(vecs[q], vecs[j])), 4)
            if d2 > 0:
                cand.append((d2, j))
        cand.sort()
        top = cand[:_LID_K]
        if len(top) != _LID_K:
            continue
        dk = max(d2 for d2, _ in top)
        slog = sum(math.log(d2) for d2, _ in top)
        lsum = 0.5 * (_LID_K * math.log(dk) - slog)
        if lsum > 0:
            lids.append((_LID_K - 1) / lsum)
    lids_sorted = sorted(lids)
    low_med = lids_sorted[(len(lids_sorted) - 1) // 2] if lids else None
    return {
        "n_sample": len(qids),
        "n_valid": len(lids),
        "mean_lid": round(sum(lids) / len(lids), 4) if lids else None,
        "median_lid": round(low_med, 4) if lids else None,
    }


def test_lid_one_dimensional_manifold(spark, tmp_path):
    # query at 0 with neighbors 1..6 on a line: distances known in
    # closed form; LID of a 1-D manifold sample
    vecs = {0: [0.0]}
    for pos, vid in zip(range(1, 7), [1, 2, 3, 5, 6, 7]):
        vecs[vid] = [float(pos)]
    _write_embeddings(spark, tmp_path, vecs)
    r = q_lid_mle(spark, str(tmp_path)).collect()[0]
    # closed form: T_j^2 = j^2 -> lsum = 0.5 * sum ln(36/j^2)
    lsum = 0.5 * sum(math.log(36.0 / (j * j)) for j in range(1, 6))
    want = round((_LID_K - 1) / lsum, 4)
    assert r["n_sample"] == 1 and r["n_valid"] == 1
    assert r["k"] == _LID_K
    assert r["mean_lid"] == want
    assert r["median_lid"] == want
    # a 1-D sample's MLE dimension is ~1, far below ambient
    assert 0.5 < r["mean_lid"] < 2.0


def test_lid_matches_bruteforce_on_mixed_cloud(spark, tmp_path):
    # deterministic pseudo-random cloud: some points on a line, some
    # spread over 4 dims -> mixed local dimensionality
    vecs = {}
    for i in range(24):
        if i % 2 == 0:
            vecs[i] = [float(i), 0.0, 0.0, 0.0]
        else:
            h = [(_md5int(f"v:{i}:{d}") % 1000) / 100.0 for d in range(4)]
            vecs[i] = h
    _write_embeddings(spark, tmp_path, vecs)
    want = _lid_py(vecs)
    r = q_lid_mle(spark, str(tmp_path)).collect()[0]
    assert r["n_sample"] == want["n_sample"]
    assert r["n_valid"] == want["n_valid"]
    assert r["mean_lid"] == want["mean_lid"]
    assert r["median_lid"] == want["median_lid"]


def test_lid_degenerate_all_equal_distances_excluded(spark, tmp_path):
    # query 0 sees 6 neighbors all at distance 1 (unit basis vectors of
    # opposite signs on 3 axes) -> lsum == 0 -> excluded as degenerate
    vecs = {
        0: [0.0, 0.0, 0.0],
        1: [1.0, 0.0, 0.0], 2: [-1.0, 0.0, 0.0],
        3: [0.0, 1.0, 0.0], 5: [0.0, -1.0, 0.0],
        6: [0.0, 0.0, 1.0], 7: [0.0, 0.0, -1.0],
    }
    _write_embeddings(spark, tmp_path, vecs)
    r = q_lid_mle(spark, str(tmp_path)).collect()[0]
    assert r["n_sample"] == 1
    assert r["n_valid"] == 0
    assert r["mean_lid"] is None and r["median_lid"] is None


# ------------------------------------------------------ ess_weight_diagnostics


def test_ess_balanced_sources_full_ess(spark, tmp_path):
    rows = [("a", "w " * 10)] * 8 + [("b", "w " * 40)] * 2
    _write_docs(spark, tmp_path, rows)
    out = q_ess_weight_diagnostics(spark, str(tmp_path)).collect()
    assert len(out) == len(_ESS_CLIP_CAPS)
    for r in out:
        assert r["n_docs"] == 10
        assert r["ess"] == 10.0       # equal token mass -> weights 1
        assert r["ess_ratio"] == 1.0
        assert r["clipped_mass"] == 0.0
        assert r["max_weight_after"] == 1.0


def test_ess_skewed_sources_matches_hand_algebra(spark, tmp_path):
    # a: 9 docs x 10 tokens (90), b: 1 doc x 10 tokens (10); T=100, S=2
    rows = [("a", "tok " * 10)] * 9 + [("b", "tok " * 10)]
    _write_docs(spark, tmp_path, rows)
    wa, wb = (100 / 2) / 90, (100 / 2) / 10   # 0.5556, 5.0
    out = {r["clip_label"]: r
           for r in q_ess_weight_diagnostics(spark, str(tmp_path)).collect()}
    for label, cap in _ESS_CLIP_CAPS:
        ca, cb = min(wa, cap), min(wb, cap)
        sw = 9 * ca + cb
        sw2 = 9 * ca * ca + cb * cb
        raw = 9 * wa + wb
        r = out[label]
        assert r["ess"] == round(sw * sw / sw2, 2)
        assert r["ess_ratio"] == round(sw * sw / sw2 / 10, 4)
        assert r["clipped_mass"] == round(
            (9 * (wa - ca) + (wb - cb)) / raw, 4)
        assert r["max_weight_after"] == round(max(ca, cb), 4)
    # clipping trades rebalancing mass for ESS, monotonically
    assert (out["cap_1"]["ess"] >= out["cap_2"]["ess"]
            >= out["cap_5"]["ess"] >= out["uncapped"]["ess"])
    assert out["uncapped"]["clipped_mass"] == 0.0


# ---------------------------------------------------- block_bootstrap_daily_ci


def _bb_py(counts):
    y = list(counts)
    n = len(y)
    ll = _BB_BLOCK_LEN
    means = []
    for r in range(_BB_REPS):
        tot = 0
        for j in range((n + ll - 1) // ll):
            start = _md5int(f"bb:{r}:{j}") % n
            for o in range(ll):
                if j * ll + o < n:
                    tot += y[(start + o) % n]
        means.append((tot / n, r))
    means.sort()
    return {
        "n_days": n,
        "mean_daily": round(sum(y) / n, 4),
        "ci_lo": round(means[_BB_LO_RANK - 1][0], 4),
        "ci_hi": round(means[_BB_HI_RANK - 1][0], 4),
    }


def test_block_bootstrap_matches_sequential_python(spark, tmp_path):
    counts = [3, 5, 2, 8, 13, 1, 7, 4, 9, 6, 2, 11]
    _write_daily_counts(spark, tmp_path, counts)
    want = _bb_py(counts)
    r = q_block_bootstrap_daily_ci(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == want["n_days"]
    assert r["block_len"] == _BB_BLOCK_LEN
    assert r["n_reps"] == _BB_REPS
    assert r["mean_daily"] == want["mean_daily"]
    assert r["ci_lo"] == want["ci_lo"]
    assert r["ci_hi"] == want["ci_hi"]
    assert r["ci_lo"] <= r["mean_daily"] <= r["ci_hi"]


def test_block_bootstrap_constant_series_degenerate_ci(spark, tmp_path):
    counts = [4] * 9
    _write_daily_counts(spark, tmp_path, counts)
    r = q_block_bootstrap_daily_ci(spark, str(tmp_path)).collect()[0]
    assert r["mean_daily"] == 4.0
    assert r["ci_lo"] == 4.0 and r["ci_hi"] == 4.0
