"""Round-5 batch-77 operators on crafted inputs, verified against
independent Python computations: tost_equivalence_halves (two
one-sided tests for gate-rate equivalence), shapiro_francia_lognormal
(W' with Royston z), grubbs_max_daily (exact-critical-value max
outlier via Cornish-Fisher t).  Plan pins at the bottom."""

from __future__ import annotations

import datetime
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _QNORM_A,
    _QNORM_B,
    _QNORM_C,
    _QNORM_D,
    _QNORM_PHIGH,
    _TOST_MARGIN,
    q_grubbs_max_daily,
    q_shapiro_francia_lognormal,
    q_tost_equivalence_halves,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _qnorm(p):
    a, b, c, d = _QNORM_A, _QNORM_B, _QNORM_C, _QNORM_D
    if p < 0.5:
        return -_qnorm(1 - p)
    if p <= _QNORM_PHIGH:
        q = p - 0.5
        r = q * q
        return ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                  + a[4]) * r + a[5]) * q
                / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                    + b[4]) * r + 1))
    u = math.sqrt(-2.0 * math.log(1.0 - p))
    return (-(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u
              + c[4]) * u + c[5])
            / ((((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1))


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _gate(text):
    sc = sum(_md5u("w:%d" % (_md5u(tok) % 4096)) % 2001 - 1000
             for tok in _toks(text))
    return 1.0 if sc >= 0 else 0.0


def _write_docs(spark, path, rows):
    """rows: (doc_id, text, n_chars)"""
    spark.createDataFrame(
        [(i, t, "en", "s", n) for i, t, n in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# -------------------------------------------------------------------- TOST


def _tost_ref(rows):
    halves = {0: [], 1: []}
    for i, t, _n in rows:
        halves[i % 2].append(_gate(t))
    n0, n1 = len(halves[0]), len(halves[1])
    p0, p1 = sum(halves[0]) / n0, sum(halves[1]) / n1
    d = p0 - p1
    se = math.sqrt(p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
    m = _TOST_MARGIN
    if se == 0:
        z = None
        verdict = "equivalent" if abs(d) < m else "not_demonstrated"
    else:
        z = min((d + m) / se, (m - d) / se)
        verdict = "equivalent" if z > 1.6449 else "not_demonstrated"
    return (n0, n1, _r(p0), _r(p1), _r(d), _r(d - 1.6449 * se),
            _r(d + 1.6449 * se), _r(z) if z is not None else None, verdict)


_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
          " lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def test_tost_exchangeable_halves_equivalent(spark, tmp_path):
    # identical text distribution in both halves; n must be large
    # enough that the binomial se can demonstrate a ±5pp margin
    # (se ~ sqrt(2*p(1-p)/n_half) needs n_half >~ 550 at p=0.5)
    rows = []
    for i in range(1, 1601):
        t = " ".join(_WORDS[((i // 2) + j) % len(_WORDS)]
                     for j in range(4))
        rows.append((i, t, 10))
    _write_docs(spark, tmp_path, rows)
    got = q_tost_equivalence_halves(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _tost_ref(rows)
    assert got[0]["verdict"] == "equivalent"
    assert abs(got[0]["rate_diff"]) < _TOST_MARGIN


def test_tost_biased_half_fails(spark, tmp_path):
    # odd half gets only failing words, even half only passing
    goods = [w for w in _WORDS if _gate(w) == 1.0]
    bads = [w for w in _WORDS if _gate(w) == 0.0]
    rows = []
    for i in range(1, 201):
        w = goods[i % len(goods)] if i % 2 == 0 else bads[i % len(bads)]
        rows.append((i, w, 10))
    _write_docs(spark, tmp_path, rows)
    r = q_tost_equivalence_halves(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tost_ref(rows)
    assert r["verdict"] == "not_demonstrated"
    assert r["tost_z"] is None or r["tost_z"] < 1.6449


def test_tost_unanimous_degenerate(spark, tmp_path):
    goods = [w for w in _WORDS if _gate(w) == 1.0]
    rows = [(i, goods[i % len(goods)], 10) for i in range(1, 41)]
    _write_docs(spark, tmp_path, rows)
    r = q_tost_equivalence_halves(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tost_ref(rows)
    assert r["verdict"] == "equivalent" and r["tost_z"] is None


# --------------------------------------------------------- shapiro-francia


def _sf_ref(ncs):
    vals = sorted(math.log(n) for n in ncs if n > 0)
    n = len(vals)
    bs = [_qnorm((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)]
    mv, mb = sum(vals) / n, sum(bs) / n
    num = sum(v * b for v, b in zip(vals, bs)) - n * mv * mb
    den = math.sqrt((sum(v * v for v in vals) - n * mv * mv)
                    * (sum(b * b for b in bs) - n * mb * mb))
    w = (num / den) ** 2
    mu = -1.2725 + 1.0521 * (math.log(math.log(n)) - math.log(n))
    sig = 1.0308 - 0.26758 * (math.log(math.log(n)) + 2.0 / math.log(n))
    z = (math.log(1 - w) - mu) / sig
    verdict = "not_lognormal" if z > 1.6449 else "lognormal_plausible"
    return (n, _r(w), _r(z), verdict)


def test_sf_lognormal_accepted(spark, tmp_path):
    # genuinely lognormal-shaped lengths via inverse-CDF sampling of
    # equally spaced quantiles (a perfect normal Q-Q line)
    ncs = [max(1, int(round(math.exp(5 + 0.8 * _qnorm((i - 0.5) / 80)))))
           for i in range(1, 81)]
    rows = [(i, "w", n) for i, n in enumerate(ncs, 1)]
    _write_docs(spark, tmp_path, rows)
    got = q_shapiro_francia_lognormal(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _sf_ref(ncs)
    assert got[0]["verdict"] == "lognormal_plausible"
    assert got[0]["w_prime"] > 0.99


def test_sf_bimodal_rejected(spark, tmp_path):
    # two widely separated tight modes: the Q-Q line is a staircase
    ncs = [100 + i % 3 for i in range(40)] \
        + [100000 + i % 3 for i in range(40)]
    rows = [(i, "w", n) for i, n in enumerate(ncs, 1)]
    _write_docs(spark, tmp_path, rows)
    r = q_shapiro_francia_lognormal(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _sf_ref(ncs)
    assert r["verdict"] == "not_lognormal"


def test_sf_ties_exact(spark, tmp_path):
    ncs = [50] * 10 + [150] * 10 + [450] * 10 + [1350] * 10
    rows = [(i, "w", n) for i, n in enumerate(ncs, 1)]
    _write_docs(spark, tmp_path, rows)
    r = q_shapiro_francia_lognormal(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _sf_ref(ncs)


# ------------------------------------------------------------------ grubbs


def _write_events(spark, path, day_counts):
    ev, eid = [], 0
    for day, cnt in enumerate(day_counts, 1):
        for _ in range(cnt):
            eid += 1
            ev.append((eid, eid % 30, "click",
                       datetime.datetime(2024, 3, day, 10, 0), 1.0))
    spark.createDataFrame(
        ev,
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _grubbs_ref(day_counts):
    cs = [float(c) for c in day_counts]
    n = len(cs)
    m = sum(cs) / n
    sd = math.sqrt(sum((c - m) ** 2 for c in cs) / (n - 1))
    g = (max(cs) - m) / sd
    zq = _qnorm(1 - 0.05 / (2 * n))
    nu = n - 2.0
    tq = (zq + (zq ** 3 + zq) / (4 * nu)
          + (5 * zq ** 5 + 16 * zq ** 3 + 3 * zq) / (96 * nu ** 2)
          + (3 * zq ** 7 + 19 * zq ** 5 + 17 * zq ** 3 - 15 * zq)
          / (384 * nu ** 3))
    gcrit = ((n - 1) / math.sqrt(n)) * math.sqrt(tq * tq / (n - 2 + tq * tq))
    verdict = "max_day_is_outlier" if g > gcrit else "max_day_consistent"
    return (n, _r(m, 2), _r(sd, 2), int(max(cs)), _r(g), _r(gcrit), verdict)


def test_grubbs_spike_detected(spark, tmp_path):
    counts = [40 + (d * 17) % 25 for d in range(24)] + [600]
    _write_events(spark, tmp_path, counts)
    got = q_grubbs_max_daily(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _grubbs_ref(counts)
    assert got[0]["verdict"] == "max_day_is_outlier"


def test_grubbs_normal_variation_consistent(spark, tmp_path):
    counts = [40 + (d * 17) % 25 for d in range(25)]
    _write_events(spark, tmp_path, counts)
    r = q_grubbs_max_daily(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _grubbs_ref(counts)
    assert r["verdict"] == "max_day_consistent"
    # sanity: critical value in the textbook range for N=25
    assert 2.5 < r["g_crit_05"] < 3.2


# ------------------------------------------------------------ plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    rows = [(i, _WORDS[i % len(_WORDS)], 100 + i) for i in range(1, 31)]
    _write_docs(spark, tmp_path, rows)
    for fn in (q_tost_equivalence_halves, q_shapiro_francia_lognormal):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    _write_events(spark, tmp_path, [30, 40, 50, 35, 45])
    plan = q_grubbs_max_daily(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan
