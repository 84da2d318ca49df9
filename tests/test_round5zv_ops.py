"""Round-5 batch-50 operators on crafted inputs, verified against
independent Python computations: dickey_fuller_test (unit-root t),
granger_causality_lite (lag-1 cross-prediction F both ways),
mmd_linear_embedding_drift (streaming RBF MMD)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np

from pdf_extractor_spark.queries import (
    q_dickey_fuller_test,
    q_granger_causality_lite,
    q_mmd_linear_embedding_drift,
)

_BASE = datetime(2025, 5, 5)


def _write_events(spark, path, rows):
    """rows: (ts, event_type)"""
    spark.createDataFrame(
        [(i + 1, ts, i % 5, 1.0, et, "{}")
         for i, (ts, et) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, value double,"
        " event_type string, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _daily(counts_by_type):
    rows = []
    for et, counts in counts_by_type.items():
        for d, c in enumerate(counts):
            for j in range(c):
                rows.append((_BASE + timedelta(days=d, hours=3, minutes=j),
                             et))
    return rows


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


# -------------------------------------------------------- dickey_fuller


def _df_ref(y):
    y = np.asarray(y, dtype=float)
    d, z = np.diff(y), y[:-1]
    m = len(d)
    czz = ((z - z.mean()) ** 2).sum()
    czd = ((z - z.mean()) * (d - d.mean())).sum()
    cdd = ((d - d.mean()) ** 2).sum()
    g = czd / czz
    s2 = (cdd - czd**2 / czz) / (m - 2)
    t = g / math.sqrt(s2 / czz)
    return m, g, t


def test_dickey_fuller_mean_reverting_rejects_unit_root(spark, tmp_path):
    # strong mean reversion around 10
    y = [10, 16, 5, 15, 4, 14, 6, 17, 5, 13, 7, 16, 4, 15, 6]
    _write_events(spark, tmp_path, _daily({"view": y}))
    m, g, t = _df_ref(y)
    row = q_dickey_fuller_test(spark, str(tmp_path)).collect()[0]
    assert row["n_obs"] == m
    assert row["gamma_hat"] == round(g, 6)
    assert row["implied_rho"] == round(1 + g, 6)
    assert row["df_t_stat"] == round(t, 4)
    assert t < -2.86 and row["stationary"]


def test_dickey_fuller_trending_walk_not_stationary(spark, tmp_path):
    # near-unit-root: cumulative drift
    y = [5, 6, 8, 9, 11, 12, 14, 15, 17, 18, 20, 21, 23, 24]
    _write_events(spark, tmp_path, _daily({"view": y}))
    m, g, t = _df_ref(y)
    row = q_dickey_fuller_test(spark, str(tmp_path)).collect()[0]
    assert row["df_t_stat"] == round(t, 4)
    assert not row["stationary"]


# ---------------------------------------------------------- granger_lite


def _granger_ref(a, b):
    """F for 'does x's lag help predict y' for both (y=a,x=b), (y=b,x=a)."""
    def fstat(y, xo, xc):
        y, xo, xc = (np.asarray(v, dtype=float) for v in (y, xo, xc))
        m = len(y)
        cy, co, cc = y - y.mean(), xo - xo.mean(), xc - xc.mean()
        cyy, c11, c22 = (cy**2).sum(), (co**2).sum(), (cc**2).sum()
        c1y, c2y, c12 = (co * cy).sum(), (cc * cy).sum(), (co * cc).sum()
        ssr_r = cyy - c1y**2 / c11
        det = c11 * c22 - c12**2
        ssr_u = cyy - ((c1y * c22 - c2y * c12) * c1y
                       + (c2y * c11 - c1y * c12) * c2y) / det
        return ssr_r, ssr_u, (ssr_r - ssr_u) / (ssr_u / (m - 3))

    f1 = fstat(a[1:], a[:-1], b[:-1])   # effect = a, cause = b
    f2 = fstat(b[1:], b[:-1], a[:-1])   # effect = b, cause = a
    return f1, f2


def test_granger_lagged_driver_detected_one_way(spark, tmp_path):
    # purchase_t follows view_{t-1}; view is self-driven jitter
    view = [10, 3, 14, 5, 12, 4, 15, 6, 11, 3, 13, 5, 14, 4, 12]
    purchase = [2] + [v // 2 for v in view[:-1]]  # pure lag of view
    _write_events(spark, tmp_path,
                  _daily({"view": view, "purchase": purchase}))
    # ref returns (effect=view, cause=purchase) first, then the reverse
    (ssr_r1, ssr_u1, f1), (ssr_r2, ssr_u2, f2) = _granger_ref(
        view, purchase)
    rows = {(r["cause_type"], r["effect_type"]): r
            for r in q_granger_causality_lite(spark, str(tmp_path))
            .collect()}
    # top-2 types by count: 'view' rank 1, 'purchase' rank 2
    r_pv = rows[("purchase", "view")]      # effect view (dir 1)
    r_vp = rows[("view", "purchase")]      # effect purchase (dir 2)
    assert r_pv["f_stat"] == round(f1, 4)
    assert r_vp["f_stat"] == round(f2, 4)
    assert r_pv["ssr_restricted"] == round(ssr_r1, 4)
    assert r_vp["ssr_unrestricted"] == round(ssr_u2, 4)
    # view's lag predicts purchase strongly; reverse direction weak
    assert r_vp["granger_improves"] and f2 > 3.84
    assert not r_pv["granger_improves"]


def test_granger_zero_fills_missing_days(spark, tmp_path):
    # purchase absent on most days: those are zeros, not dropped rows
    rows = _daily({"view": [5, 5, 5, 5, 5, 5]})
    rows += [(_BASE + timedelta(days=2, hours=4), "purchase")]
    _write_events(spark, tmp_path, rows)
    out = q_granger_causality_lite(spark, str(tmp_path)).collect()
    assert all(r["n_obs"] == 5 for r in out)  # 6 days - 1 lag


# ------------------------------------------------ mmd linear drift


def _mmd_ref(vecs):
    m = np.asarray(vecs, dtype=float)
    x = m[::2]
    y = m[1::2]
    qn = min(len(x), len(y)) // 2
    quads = [(x[2 * i], x[2 * i + 1], y[2 * i], y[2 * i + 1])
             for i in range(qn)]
    d = [(np.sum((a - b) ** 2), np.sum((c - e) ** 2),
          np.sum((a - e) ** 2), np.sum((b - c) ** 2))
         for a, b, c, e in quads]
    bw = float(np.mean([v for row in d for v in row]))
    h = [math.exp(-r[0] / bw) + math.exp(-r[1] / bw)
         - math.exp(-r[2] / bw) - math.exp(-r[3] / bw) for r in d]
    q = len(h)
    mh = sum(h) / q
    vh = (sum(v * v for v in h) - sum(h) ** 2 / q) / (q - 1)
    z = mh / math.sqrt(vh / q)
    return q, bw, mh, z


def test_mmd_detects_variance_collapse(spark, tmp_path):
    # even ids: spread cloud; odd ids: collapsed near origin — the mean
    # barely moves but the DISTRIBUTION changes
    rng = np.random.default_rng(11)
    vecs = []
    for i in range(40):
        if i % 2 == 0:
            vecs.append((rng.standard_normal(8) * 3).tolist())
        else:
            vecs.append((rng.standard_normal(8) * 0.05).tolist())
    _write_embeddings(spark, tmp_path, vecs)
    q, bw, mh, z = _mmd_ref(vecs)
    row = q_mmd_linear_embedding_drift(spark, str(tmp_path)).collect()[0]
    assert row["n_quads"] == q == 10
    assert row["bandwidth_sq"] == round(bw, 4)
    assert row["mmd2_linear"] == round(mh, 6)
    assert row["z_stat"] == round(z, 4)
    assert z >= 1.645 and row["drifted"]


def test_mmd_same_distribution_not_drifted(spark, tmp_path):
    rng = np.random.default_rng(13)
    vecs = [rng.standard_normal(8).tolist() for _ in range(40)]
    _write_embeddings(spark, tmp_path, vecs)
    q, bw, mh, z = _mmd_ref(vecs)
    row = q_mmd_linear_embedding_drift(spark, str(tmp_path)).collect()[0]
    assert row["mmd2_linear"] == round(mh, 6)
    assert row["z_stat"] == round(z, 4)
    assert not row["drifted"]
