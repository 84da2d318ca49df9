"""Round-5 batch-48 operators on crafted inputs, verified against
independent Python computations: spectral_entropy_daily (full
periodogram entropy), sample_entropy_daily (SampEn m=2 r=0.2sigma),
atkinson_lorenz_inequality (welfare indices + Lorenz asymmetry)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pdf_extractor_spark.queries import (
    q_atkinson_lorenz_inequality,
    q_sample_entropy_daily,
    q_spectral_entropy_daily,
)

_BASE = datetime(2025, 3, 3)


def _write_events_daily(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for j in range(c):
            eid += 1
            ts = _BASE + timedelta(days=d, hours=6, minutes=j)
            rows.append((eid, ts, eid % 5, 1.0, "view", "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, value double,"
        " event_type string, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs_nchars(spark, path, vals):
    spark.createDataFrame(
        [(i + 1, "x", "en", "s", n) for i, n in enumerate(vals)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------ spectral entropy


def _spec_ref(counts):
    n = len(counts)
    mu = sum(counts) / n
    x = [c - mu for c in counts]
    ks = range(1, max(n // 2, 1) + 1)
    pw = []
    for k in ks:
        cr = sum(x[t] * math.cos(2 * math.pi * k * t / n)
                 for t in range(n))
        ci = sum(x[t] * math.sin(2 * math.pi * k * t / n)
                 for t in range(n))
        pw.append(cr**2 + ci**2)
    tot = sum(pw)
    q = [p / tot for p in pw]
    ent = -sum(v * math.log(v) for v in q if v > 0)
    m = len(q)
    peak = max(range(m), key=lambda j: (q[j], -j))
    return (m, round(ent, 4), round(ent / math.log(m), 4),
            round(n / (peak + 1), 4), round(q[peak], 4))


def test_spectral_entropy_sinusoid_concentrates(spark, tmp_path):
    counts = [10 + round(6 * math.cos(2 * math.pi * d / 8))
              for d in range(16)]
    _write_events_daily(spark, tmp_path, counts)
    m, ent, norm, ppd, share = _spec_ref(counts)
    row = q_spectral_entropy_daily(spark, str(tmp_path)).collect()[0]
    assert row["n_freqs"] == m == 8
    assert row["spectral_entropy_nats"] == ent
    assert row["spectral_entropy_norm"] == norm
    assert row["peak_period_days"] == ppd == 8.0
    assert row["peak_power_share"] == share
    assert share > 0.95 and norm < 0.25  # one cycle carries the variance


def test_spectral_entropy_broadband_vs_pure(spark, tmp_path):
    # alternating high-freq pattern: peak at Nyquist (period 2)
    counts = [3, 9] * 8
    _write_events_daily(spark, tmp_path, counts)
    row = q_spectral_entropy_daily(spark, str(tmp_path)).collect()[0]
    assert row["peak_period_days"] == 2.0
    assert row["peak_power_share"] > 0.99


# -------------------------------------------------------- sample entropy


def _sampen_ref(counts):
    n = len(counts)
    mu = sum(counts) / n
    sigma = math.sqrt(sum(c * c for c in counts) / n - mu * mu)
    r = 0.2 * sigma
    tpl = [(counts[i], counts[i + 1], counts[i + 2])
           for i in range(n - 2)]
    b = a = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            if (abs(tpl[i][0] - tpl[j][0]) <= r
                    and abs(tpl[i][1] - tpl[j][1]) <= r):
                b += 1
                if abs(tpl[i][2] - tpl[j][2]) <= r:
                    a += 1
    s = -math.log(a / b) if a and b else None
    return r, b, a, s


def test_sample_entropy_matches_python(spark, tmp_path):
    # near-repeating pattern: plenty of m=2 matches, one break at m=3
    counts = [10, 20, 30] * 4 + [10, 20, 24]
    _write_events_daily(spark, tmp_path, counts)
    r, b, a, s = _sampen_ref(counts)
    assert s is not None and b > a > 0  # scenario sanity
    row = q_sample_entropy_daily(spark, str(tmp_path)).collect()[0]
    assert row["n_days"] == len(counts)
    assert row["r_tol"] == round(r, 4)
    assert row["template_matches_m2"] == b
    assert row["template_matches_m3"] == a
    assert row["sampen"] == round(s, 4)


def test_sample_entropy_no_m3_matches_is_null(spark, tmp_path):
    counts = [4, 7, 13, 5, 9, 14, 4, 8, 13, 6, 9, 12, 5, 7, 14]
    _write_events_daily(spark, tmp_path, counts)
    r, b, a, s = _sampen_ref(counts)
    assert a == 0 and s is None  # r = 0.2 sigma is too tight here
    row = q_sample_entropy_daily(spark, str(tmp_path)).collect()[0]
    assert row["template_matches_m2"] == b
    assert row["template_matches_m3"] == 0
    assert row["sampen"] is None


def test_sample_entropy_constant_series_is_zero(spark, tmp_path):
    _write_events_daily(spark, tmp_path, [5] * 10)
    row = q_sample_entropy_daily(spark, str(tmp_path)).collect()[0]
    # sigma = 0 -> r = 0, but identical templates still match exactly
    assert row["template_matches_m2"] == row["template_matches_m3"] > 0
    assert row["sampen"] == 0.0


# ------------------------------------------------- atkinson / lorenz


def _atkinson_ref(vals):
    xs = [max(v, 1) for v in vals]
    n = len(xs)
    mu = sum(xs) / n
    total = float(sum(xs))
    a05 = 1 - (sum(math.sqrt(x) for x in xs) / n) ** 2 / mu
    a1 = 1 - math.exp(sum(math.log(x) for x in xs) / n) / mu
    below = [x for x in xs if x < mu]
    if not below:
        s = 1.0
    else:
        x_m = max(below)
        x_m1 = min(x for x in xs if x >= mu)
        delta = (mu - x_m) / (x_m1 - x_m)
        s = (len(below) + delta) / n + (sum(below) + delta * x_m1) / total
    return round(a05, 4), round(a1, 4), round(s, 4)


def test_atkinson_lorenz_skewed_matches_python(spark, tmp_path):
    vals = [10, 20, 30, 40, 50, 60, 700]  # one giant: S > 1
    _write_docs_nchars(spark, tmp_path, vals)
    a05, a1, s = _atkinson_ref(vals)
    row = q_atkinson_lorenz_inequality(spark, str(tmp_path)).collect()[0]
    assert row["n_docs"] == 7
    assert row["atkinson_eps05"] == a05
    assert row["atkinson_eps1"] == a1
    assert row["lorenz_asymmetry"] == s
    assert s > 1.0  # giant-driven inequality


def test_atkinson_lorenz_tiny_doc_regime(spark, tmp_path):
    vals = [1, 1, 1, 2, 2, 100, 110, 120]  # many tiny docs: S < 1
    _write_docs_nchars(spark, tmp_path, vals)
    a05, a1, s = _atkinson_ref(vals)
    row = q_atkinson_lorenz_inequality(spark, str(tmp_path)).collect()[0]
    assert (row["atkinson_eps05"], row["atkinson_eps1"],
            row["lorenz_asymmetry"]) == (a05, a1, s)
    assert s < 1.0


def test_atkinson_lorenz_equal_degenerate(spark, tmp_path):
    _write_docs_nchars(spark, tmp_path, [50] * 6)
    row = q_atkinson_lorenz_inequality(spark, str(tmp_path)).collect()[0]
    assert row["atkinson_eps05"] == 0.0
    assert row["atkinson_eps1"] == 0.0
    assert row["lorenz_asymmetry"] == 1.0  # below-mean set empty branch
