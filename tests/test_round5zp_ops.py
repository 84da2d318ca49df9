"""Round-5 batch-44 operators on crafted inputs, verified against
independent Python computations: durbin_watson_daily (OLS residual
lag-1 autocorrelation), chow_break_test (two-regime F at the
midpoint), anderson_darling_drift (grouped two-sample A²)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

from pdf_extractor_spark.queries import (
    q_anderson_darling_drift,
    q_chow_break_test,
    q_durbin_watson_daily,
)

_BASE = datetime(2025, 1, 6)


def _write_events_daily(spark, path, counts):
    """Events parquet with counts[d] events on day d (UTC-midnight+noon
    offsets so every event lands inside its floor(ts/86400) day)."""
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for j in range(c):
            eid += 1
            ts = _BASE + timedelta(days=d, hours=6, minutes=j)
            rows.append((eid, ts, eid % 7, float(j), "view", "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, value double,"
        " event_type string, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs_nchars(spark, path, vals):
    spark.createDataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate(vals)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _ols_resid(y):
    x = np.arange(len(y), dtype=float)
    b, a = np.polyfit(x, np.asarray(y, dtype=float), 1)
    return np.asarray(y, dtype=float) - (a + b * x)


# ----------------------------------------------------------- durbin_watson


def test_durbin_watson_alternating_series_matches_numpy(spark, tmp_path):
    counts = [5, 1, 5, 1, 5, 1, 5, 1]  # flat trend, violently alternating
    _write_events_daily(spark, tmp_path, counts)
    e = _ols_resid(counts)
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e**2))
    row = q_durbin_watson_daily(spark, str(tmp_path)).collect()[0]
    assert row["n_days"] == 8
    assert row["dw_stat"] == round(dw, 4)
    assert row["rho_lag1"] == round(1 - dw / 2, 4)
    # alternation => dw ~ 4, NOT positive autocorrelation
    assert dw > 3.0 and not row["positive_autocorr"]


def test_durbin_watson_smooth_series_flags_positive(spark, tmp_path):
    # residuals from a quadratic bend are smooth => dw << 2
    counts = [(d - 4) ** 2 + 1 for d in range(9)]
    _write_events_daily(spark, tmp_path, counts)
    e = _ols_resid(counts)
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e**2))
    row = q_durbin_watson_daily(spark, str(tmp_path)).collect()[0]
    assert row["dw_stat"] == round(dw, 4)
    assert dw < 1.5 and row["positive_autocorr"]


def test_durbin_watson_perfect_line_null_guard(spark, tmp_path):
    _write_events_daily(spark, tmp_path, [1, 2, 3, 4, 5])
    row = q_durbin_watson_daily(spark, str(tmp_path)).collect()[0]
    # zero residuals: 0/0 guarded to NULL, flag coalesced to False
    assert row["dw_stat"] is None
    assert row["positive_autocorr"] is False


# --------------------------------------------------------------- chow_break


def _chow_f(y):
    y = np.asarray(y, dtype=float)
    m = len(y) // 2

    def ssr(seg_y, seg_x):
        b, a = np.polyfit(seg_x, seg_y, 1)
        return float(np.sum((seg_y - (a + b * seg_x)) ** 2))

    x = np.arange(len(y), dtype=float)
    s_p = ssr(y, x)
    s_1 = ssr(y[:m], x[:m])
    s_2 = ssr(y[m:], x[m:])
    f = ((s_p - (s_1 + s_2)) / 2) / ((s_1 + s_2) / (len(y) - 4))
    return s_p, s_1 + s_2, f


def test_chow_detects_midpoint_regime_change(spark, tmp_path):
    rng = np.random.default_rng(7)
    flat = (10 + rng.integers(0, 3, size=6)).tolist()
    steep = [40 + 8 * d + int(rng.integers(0, 3)) for d in range(6)]
    counts = flat + steep
    _write_events_daily(spark, tmp_path, counts)
    s_p, s_s, f = _chow_f(counts)
    row = q_chow_break_test(spark, str(tmp_path)).collect()[0]
    assert row["n_days"] == 12
    assert row["ssr_pooled"] == round(s_p, 4)
    assert row["ssr_split"] == round(s_s, 4)
    assert row["chow_f"] == round(f, 4)
    assert f > 3.0 and row["break_detected"]


def test_chow_stable_series_no_break(spark, tmp_path):
    counts = [3 + 2 * d + (d % 2) for d in range(10)]  # one regime + jitter
    _write_events_daily(spark, tmp_path, counts)
    s_p, s_s, f = _chow_f(counts)
    row = q_chow_break_test(spark, str(tmp_path)).collect()[0]
    assert row["chow_f"] == round(f, 4)
    assert not row["break_detected"]


# -------------------------------------------------- anderson_darling_drift


def _ad_a2(old, new):
    vals = sorted(set(old) | set(new))
    na, nb = len(old), len(new)
    nn = na + nb
    ca = cum = 0.0
    a2 = 0.0
    for v in vals:
        la = old.count(v)
        lb = new.count(v)
        ca += la
        cum += la + lb
        if cum < nn:
            a2 += (la + lb) * (ca * nn - na * cum) ** 2 / (cum * (nn - cum))
    return a2 / (na * nb)


def test_ad_drift_identical_halves_not_drifted(spark, tmp_path):
    # doc_id 0..79 old, 80..99 new (cut = floor(99*0.8) = 79)
    base = [100, 200, 300, 400, 500] * 16          # ids 0..79
    new = [100, 200, 300, 400, 500] * 4            # ids 80..99
    _write_docs_nchars(spark, tmp_path, base + new)
    old_vals = (base + new)[:79]
    new_vals = (base + new)[79:]
    row = q_anderson_darling_drift(spark, str(tmp_path)).collect()[0]
    assert (row["n_old"], row["n_new"]) == (79, 21)
    assert row["ad_a2"] == round(_ad_a2(old_vals, new_vals), 4)
    assert not row["drifted"]


def test_ad_drift_tail_shift_detected_and_matches_python(spark, tmp_path):
    # new batch is 10x longer => hard drift
    vals = [100 + i for i in range(80)] + [5000 + i for i in range(20)]
    _write_docs_nchars(spark, tmp_path, vals)
    cut = int((len(vals) - 1) * 0.8)  # floor(max_id * 0.8) = 79
    row = q_anderson_darling_drift(spark, str(tmp_path)).collect()[0]
    expect = _ad_a2(vals[:cut], vals[cut:])
    assert row["ad_a2"] == round(expect, 4)
    assert expect > 2.492 and row["drifted"]
