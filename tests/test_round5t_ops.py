"""Round-5 batch-29 operators on crafted inputs, verified against
independent Python computations: retention_half_life (log-linear decay
fit on a hand-built 1/.75/.5/.25 retention curve, plus the degenerate
single-offset NULL guard), systematic_sampling_deff (lag-k Pearson on an
alternating length sequence with known ±1 correlations),
marginal_dedup_curve (first-owner digest attribution incl. NULL text),
sprt_conversion_monitor (Wald LLR walk with a crafted H1 crossing),
length_mixture_em (full 3-iteration EM mirror on a bimodal corpus), and
weibull_churn_fit (median-rank regression mirror on 4 lifetimes)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from pdf_extractor_spark.queries import (
    _SPRT_LLR_HIT,
    _SPRT_LLR_MISS,
    _SPRT_LN_A,
    _SPRT_LN_B,
    q_length_mixture_em,
    q_marginal_dedup_curve,
    q_retention_half_life,
    q_sprt_conversion_monitor,
    q_systematic_sampling_deff,
    q_weibull_churn_fit,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_events(spark, path, rows):
    # rows: (user_id, day, event_type)
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(days=d, seconds=i), u, et, 0.0, "{}")
         for i, (u, d, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_documents(spark, path, rows):
    # rows: (doc_id, text_or_None, source)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len().fillna(0).astype("int64")
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _ols(pts):
    """Mirror of the moment-form OLS used by both fit queries."""
    k = float(len(pts))
    st = sum(t for t, _ in pts)
    sy = sum(y for _, y in pts)
    sty = sum(t * y for t, y in pts)
    stt = sum(t * t for t, _ in pts)
    syy = sum(y * y for _, y in pts)
    den = k * stt - st * st
    slope = (k * sty - st * sy) / den
    icept = (sy - slope * st) / k
    cty, ctt, cyy = sty - st * sy / k, stt - st * st / k, syy - sy * sy / k
    return slope, icept, cty * cty / (ctt * cyy)


# ---------------------------------------------------------- retention_half_life


def test_retention_decay_fit_on_crafted_curve(spark, tmp_path):
    # cohort shares by offset: 4/4, 3/4, 2/4, 1/4 — first days differ
    # per user so the offset is genuinely relative to each user's start
    rows = []
    for u, days in ((1, [0, 1, 2, 3]), (2, [5, 6]),
                    (3, [2, 3, 4]), (4, [7])):
        rows += [(u, d, "view") for d in days]
    _write_events(spark, tmp_path, rows)
    r = q_retention_half_life(spark, str(tmp_path)).collect()[0]
    pts = [(0.0, math.log(1.0)), (1.0, math.log(0.75)),
           (2.0, math.log(0.5)), (3.0, math.log(0.25))]
    slope, icept, r2 = _ols(pts)
    assert r["n_offsets"] == 4
    assert r["decay_rate_per_day"] == round(-slope, 6)
    assert r["half_life_days"] == round(math.log(2.0) / -slope, 4)
    assert r["fitted_intercept_share"] == round(math.exp(icept), 4)
    assert r["log_fit_r2"] == round(r2, 4)
    # the crafted curve halves roughly every ~1.4 days
    assert 1.0 < r["half_life_days"] < 2.0


def test_retention_single_offset_degrades_to_null(spark, tmp_path):
    # every user active exactly one day -> only offset 0 -> OLS denominator
    # is 0 and the nullif guards must yield NULLs, not a divide-by-zero
    _write_events(spark, tmp_path, [(1, 0, "view"), (2, 3, "view")])
    r = q_retention_half_life(spark, str(tmp_path)).collect()[0]
    assert r["n_offsets"] == 1
    assert r["decay_rate_per_day"] is None
    assert r["half_life_days"] is None


# ------------------------------------------------------ systematic_sampling_deff


def _pearson(y, x):
    n = float(len(y))
    sy, sx = sum(y), sum(x)
    syx = sum(a * b for a, b in zip(y, x))
    syy = sum(a * a for a in y)
    sxx = sum(a * a for a in x)
    return (n * syx - sy * sx) / math.sqrt(
        (n * syy - sy * sy) * (n * sxx - sx * sx))


def test_deff_alternating_sequence(spark, tmp_path):
    # lengths alternate 10/50 in doc_id order: even lags correlate +1,
    # odd lags -1 -> deff_2 = 2 (systematic every-2nd is HARMFUL),
    # deff_5 = -3 exposes the k=5 anti-phase, deff_10 = 10
    lens = [10, 50] * 8
    _write_documents(
        spark, tmp_path,
        [(i + 1, "a" * ln, "s") for i, ln in enumerate(lens)])
    out = {r["sample_every_k"]: r
           for r in q_systematic_sampling_deff(spark, str(tmp_path)).collect()}
    assert sorted(out) == [2, 5, 10]
    vals = [float(v) for v in lens]
    for k in (2, 5, 10):
        rho = _pearson(vals[k:], vals[:-k])
        r = out[k]
        assert r["serial_corr"] == round(rho, 4)
        assert r["design_effect"] == round(1 + (k - 1) * rho, 4)
        assert r["efficiency_vs_srs"] == round(1 / (1 + (k - 1) * rho), 4)
    assert out[2]["serial_corr"] == 1.0 and out[5]["serial_corr"] == -1.0


# --------------------------------------------------------- marginal_dedup_curve


def test_marginal_curve_first_owner_attribution(spark, tmp_path):
    # digest ownership goes to the lexically-first source; NULL text
    # coalesces to '' and dedups like any other digest (ADVICE r04's
    # dup_group_report NULL lesson, applied here by construction)
    rows = [
        (1, "t1", "a"), (2, "t2", "a"), (3, "t3", "a"), (4, None, "a"),
        (5, "t2", "b"), (6, "t4", "b"), (7, "t4", "b"),
        (8, "t1", "c"), (9, None, "c"),
    ]
    _write_documents(spark, tmp_path, rows)
    out = {r["source"]: r
           for r in q_marginal_dedup_curve(spark, str(tmp_path)).collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["n_docs"], a["new_unique_docs"], a["cum_unique_docs"]) == (4, 4, 4)
    assert a["novelty_rate"] == 1.0
    assert (b["n_docs"], b["new_unique_docs"], b["cum_unique_docs"]) == (3, 1, 5)
    assert b["novelty_rate"] == round(1 / 3, 4)
    assert (c["n_docs"], c["new_unique_docs"], c["cum_unique_docs"]) == (2, 0, 5)
    assert c["novelty_rate"] == 0.0


# ------------------------------------------------------- sprt_conversion_monitor


def test_sprt_walk_crosses_h1_then_continues(spark, tmp_path):
    # 20 events/day; 8 conversions/day pushes the LLR up ~1.005/day so
    # day 3 crosses ln(19); day 4 (0 conversions) drops back below —
    # the trace must show the crossing exactly once at its first day
    rows = []
    for d in range(3):
        rows += [(u, d, "purchase") for u in range(1, 9)]
        rows += [(u, d, "view") for u in range(9, 21)]
    rows += [(u, 3, "view") for u in range(1, 21)]
    _write_events(spark, tmp_path, rows)
    out = q_sprt_conversion_monitor(spark, str(tmp_path)).collect()
    assert [r["day_index"] for r in out] == [1, 2, 3, 4]
    cum, exp_states = 0.0, []
    day_llr = 8 * _SPRT_LLR_HIT + 12 * _SPRT_LLR_MISS
    for d in range(4):
        cum += day_llr if d < 3 else 20 * _SPRT_LLR_MISS
        exp_states.append(
            "accept_h1" if cum >= _SPRT_LN_A
            else "accept_h0" if cum <= _SPRT_LN_B else "continue")
        assert out[d]["cum_llr"] == round(cum, 4)
    assert [r["state"] for r in out] == exp_states
    assert exp_states == ["continue", "continue", "accept_h1", "continue"]
    assert [r["first_decision_day"] for r in out] == [0, 0, 1, 0]
    assert out[0]["conversions"] == 8 and out[0]["trials"] == 20
    assert out[0]["conv_rate"] == 0.4


# ----------------------------------------------------------- length_mixture_em


def _em_mirror(length_counts, iters=3):
    """Independent mirror of the unrolled-SQL EM on (length, count)."""
    g = sorted((math.log(float(ln)), float(c))
               for ln, c in length_counts.items())
    tot = sum(c for _, c in g)
    cum, q1, q3 = 0.0, None, None
    for v, c in g:
        cum += c
        if q1 is None and cum / tot >= 0.25:
            q1 = v
        if q3 is None and cum / tot >= 0.75:
            q3 = v
    sv = sum(c * v for v, c in g)
    svv = sum(c * v * v for v, c in g)
    var = max(svv / tot - (sv / tot) ** 2, 1e-6)
    w1, mu1, mu2, s1, s2 = 0.5, q1, q3, var, var
    for _ in range(iters):
        num = lambda v, mu, s, w: (  # noqa: E731
            w * math.exp(-(v - mu) * (v - mu) / (2 * s))
            / math.sqrt(2 * math.pi * s))
        rows = [(v, c, num(v, mu1, s1, w1)
                 / (num(v, mu1, s1, w1) + num(v, mu2, s2, 1 - w1)))
                for v, c in g]
        cr = sum(c * r for _, c, r in rows)
        cn = sum(c * (1 - r) for _, c, r in rows)
        mu1 = sum(c * r * v for v, c, r in rows) / cr
        mu2 = sum(c * (1 - r) * v for v, c, r in rows) / cn
        s1 = max(sum(c * r * v * v for v, c, r in rows) / cr - mu1 * mu1,
                 1e-6)
        s2 = max(sum(c * (1 - r) * v * v for v, c, r in rows) / cn
                 - mu2 * mu2, 1e-6)
        w1 = cr / tot
    ll = sum(c * math.log(num(v, mu1, s1, w1) + num(v, mu2, s2, 1 - w1))
             for v, c in g)
    return w1, mu1, mu2, s1, s2, ll / tot, tot


def test_mixture_em_separates_bimodal_corpus(spark, tmp_path):
    counts = {18: 20, 20: 25, 22: 15, 2000: 15, 2200: 15, 2400: 10}
    rows, did = [], 0
    for ln, c in counts.items():
        for _ in range(c):
            did += 1
            rows.append((did, "a" * ln, "s"))
    _write_documents(spark, tmp_path, rows)
    r = q_length_mixture_em(spark, str(tmp_path)).collect()[0]
    w1, mu1, mu2, s1, s2, mll, tot = _em_mirror(counts)
    assert r["n_docs"] == int(tot) == 100
    assert r["weight_low"] == round(w1, 4)
    assert r["mode_low_chars"] == round(math.exp(mu1), 4)
    assert r["mode_high_chars"] == round(math.exp(mu2), 4)
    assert r["sigma_low_ln"] == round(math.sqrt(s1), 4)
    assert r["sigma_high_ln"] == round(math.sqrt(s2), 4)
    sep = abs(mu2 - mu1) / math.sqrt((s1 + s2) / 2)
    assert r["separation"] == round(sep, 4)
    assert r["mean_loglik"] == round(mll, 4)
    # the crafted modes are ~2 decades apart: EM must recover both
    assert 0.55 <= r["weight_low"] <= 0.65        # 60 short docs
    assert 15 < r["mode_low_chars"] < 25
    assert 1800 < r["mode_high_chars"] < 2600
    assert r["separation"] > 5


# ------------------------------------------------------------ weibull_churn_fit


def test_weibull_median_rank_regression(spark, tmp_path):
    # lifetimes (first-to-last span + 1): 1, 2, 4, 8 days
    rows = [(1, 0, "view"),
            (2, 0, "view"), (2, 1, "view"),
            (3, 0, "view"), (3, 3, "view"),
            (4, 0, "view"), (4, 7, "view")]
    _write_events(spark, tmp_path, rows)
    r = q_weibull_churn_fit(spark, str(tmp_path)).collect()[0]
    pts = []
    for i, t in enumerate((1.0, 2.0, 4.0, 8.0), 1):
        f = (i - 0.3) / (4 + 0.4)
        pts.append((math.log(t), math.log(-math.log(1 - f))))
    slope, icept, r2 = _ols(pts)
    assert r["n_lifetime_values"] == 4
    assert r["weibull_shape_k"] == round(slope, 4)
    assert r["weibull_scale_days"] == round(math.exp(-icept / slope), 4)
    assert r["loglog_r2"] == round(r2, 4)
    # uniform mass over 1/2/4/8 has a thinner-than-exponential upper
    # tail under median ranks: shape lands just above 1 -> wear_out
    assert r["weibull_shape_k"] > 1.05
    assert r["churn_regime"] == "wear_out"
