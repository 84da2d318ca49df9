"""Round-5 batch-33 operators on crafted inputs, verified against
independent Python computations: absorbing_funnel_steps (hand-built
2-state chain whose fundamental-matrix solution is 15/7 and 12/7 steps;
the truncated Neumann mirror matches to 4dp and converges),
bimodality_by_source (moment-algebra mirror; twin-spike source flags
bimodal, constant source degrades to NULL), rbo_ranking_agreement
(rank-biased overlap trace between crafted volume/uniqueness
rankings)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from pdf_extractor_spark.queries import (
    _ABSORB_ITERS,
    _RBO_P,
    q_absorbing_funnel_steps,
    q_bimodality_by_source,
    q_rbo_ranking_agreement,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_events(spark, path, rows):
    # rows: (user_id, second_offset, event_type)
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_documents(spark, path, rows):
    # rows: (doc_id, text, source, n_chars)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "n_chars"])
    pdf["lang"] = "en"
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ----------------------------------------------------------- absorbing_funnel


def test_absorbing_steps_two_state_chain(spark, tmp_path):
    # edges: view->click x2, view->purchase x1, click->purchase x2,
    # click->view x1  =>  Q = [[0, 2/3], [1/3, 0]] and the exact
    # fundamental-matrix solution is t_view = 15/7, t_click = 12/7
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "view"), (2, 20, "click"), (2, 30, "purchase"),
        (3, 10, "view"), (3, 20, "purchase"),
        (4, 10, "click"), (4, 20, "view"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["from_state"]: r
           for r in q_absorbing_funnel_steps(spark, str(tmp_path)).collect()}
    assert sorted(out) == ["click", "view"]
    q = {("view", "click"): 2 / 3, ("click", "view"): 1 / 3}
    t = {"view": 1.0, "click": 1.0}
    prev = t
    for _ in range(_ABSORB_ITERS):
        prev = t
        t = {s: 1.0 + sum(pr * prev[d] for (src, d), pr in q.items()
                          if src == s)
             for s in t}
    for s, exact in (("view", 15 / 7), ("click", 12 / 7)):
        r = out[s]
        assert r["expected_steps"] == round(t[s], 4)
        assert r["last_iter_delta"] == round(t[s] - prev[s], 4)
        assert r["converged"] == 1
        # 12 Neumann terms of a rho=2/9 chain sit on the exact answer
        assert abs(r["expected_steps"] - exact) < 1e-3
    assert out["view"]["p_direct_purchase"] == round(1 / 3, 4)
    assert out["click"]["p_direct_purchase"] == round(2 / 3, 4)


# --------------------------------------------------------- bimodality_by_source


def _bimodality_mirror(lengths):
    vs = [math.log(float(x)) for x in lengths]
    n = float(len(vs))
    m1 = sum(vs) / n
    r2 = sum(v ** 2 for v in vs) / n
    r3 = sum(v ** 3 for v in vs) / n
    r4 = sum(v ** 4 for v in vs) / n
    c2 = r2 - m1 * m1
    c3 = r3 - 3 * m1 * r2 + 2 * m1 ** 3
    c4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 ** 4
    g1 = c3 / c2 ** 1.5
    g2 = c4 / (c2 * c2) - 3
    bc = (g1 * g1 + 1) / (g2 + 3 * (n - 1) ** 2 / ((n - 2) * (n - 3)))
    return round(g1, 4), round(g2, 4), round(bc, 4)


def test_bimodality_flags_twin_spike_source(spark, tmp_path):
    twin = [20] * 10 + [20000] * 10
    mid = [90, 95, 100, 100, 105, 105, 110, 110, 115, 120]
    rows = ([(i, "t", "twin", ln) for i, ln in enumerate(twin, 1)]
            + [(100 + i, "t", "mid", ln) for i, ln in enumerate(mid, 1)]
            + [(200 + i, "t", "flat", 50) for i in range(1, 6)])
    _write_documents(spark, tmp_path, rows)
    out = {r["source"]: r
           for r in q_bimodality_by_source(spark, str(tmp_path)).collect()}
    g1, g2, bc = _bimodality_mirror(twin)
    tw = out["twin"]
    assert (tw["skewness"], tw["excess_kurtosis"]) == (g1, g2)
    assert tw["bimodality_coeff"] == bc
    # symmetric two-point mass: g1=0, g2 -> -2, so BC -> 1/(corr-2) ~ 0.65
    assert tw["bimodal_flag"] == 1 and tw["bimodality_coeff"] > 0.6
    g1m, g2m, bcm = _bimodality_mirror(mid)
    md = out["mid"]
    assert md["bimodality_coeff"] == bcm
    assert md["bimodal_flag"] == 0
    # zero-variance source: c2 is 0 (-> NULL via nullif) or a float
    # epsilon whose moment ratios round to ~0; either way no
    # divide-by-zero and no bimodal flag
    fl = out["flat"]
    assert fl["skewness"] is None or abs(fl["skewness"]) < 0.01
    assert fl["bimodal_flag"] == 0


# -------------------------------------------------------- rbo_ranking_agreement


def test_rbo_trace_volume_vs_uniqueness(spark, tmp_path):
    # volumes: s1=10 > s2=8 > s3=5; uniques: s2=8 > s3=5 > s1=2
    rows = ([(i, f"s1-{i % 2}", "s1", 30) for i in range(1, 11)]
            + [(100 + i, f"s2-{i}", "s2", 30) for i in range(1, 9)]
            + [(200 + i, f"s3-{i}", "s3", 30) for i in range(1, 6)])
    _write_documents(spark, tmp_path, rows)
    out = q_rbo_ranking_agreement(spark, str(tmp_path)).collect()
    assert [r["depth"] for r in out] == [1, 2, 3]
    # ra: s1=1 s2=2 s3=3; rb: s2=1 s3=2 s1=3; joined_by: s1=3 s2=2 s3=3
    xs = {1: 0, 2: 1, 3: 3}
    cum = 0.0
    for r in out:
        d = r["depth"]
        x = xs[d]
        contrib = (1 - _RBO_P) * _RBO_P ** (d - 1) * x / d
        cum += contrib
        assert r["overlap_count"] == x
        assert r["overlap_frac"] == round(x / d, 4)
        assert r["rbo_contribution"] == round(contrib, 4)
        assert r["rbo_cumulative"] == round(cum, 4)
    # disagreeing tops, agreeing full set: RBO well below 1
    assert out[0]["overlap_count"] == 0
    assert out[-1]["overlap_frac"] == 1.0
    assert out[-1]["rbo_cumulative"] < 0.4
