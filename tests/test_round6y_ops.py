"""Round-5 batch-78 operators on crafted inputs, verified against
independent Python computations: poisson_rate_ratio (exposure-correct
weekday/weekend C-test), truncation_loss_estimate (lognormal
model-vs-measured at the p10 cutoff), gesd_daily_outliers (Rosner's
generalized ESD, k=3, the Grubbs masking fix).  Plan pins at the
bottom."""

from __future__ import annotations

import datetime
import math

from pdf_extractor_spark.queries import (
    _QNORM_A,
    _QNORM_B,
    _QNORM_C,
    _QNORM_D,
    _QNORM_PHIGH,
    q_gesd_daily_outliers,
    q_poisson_rate_ratio,
    q_truncation_loss_estimate,
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


def _pnorm(x):
    ax = abs(x)
    k = 1.0 / (1.0 + 0.2316419 * ax)
    poly = ((((1.330274429 * k - 1.821255978) * k + 1.781477937) * k
             - 0.356563782) * k + 0.319381530) * k
    up = 1.0 - math.exp(-ax * ax / 2) / 2.5066282746310002 * poly
    return up if x >= 0 else 1.0 - up


def _write_events_by_date(spark, path, date_counts):
    """date_counts: {datetime.date: n_events}"""
    ev, eid = [], 0
    for day, cnt in sorted(date_counts.items()):
        for _ in range(cnt):
            eid += 1
            ev.append((eid, eid % 30, "click",
                       datetime.datetime(day.year, day.month, day.day,
                                         10, 0), 1.0))
    spark.createDataFrame(
        ev,
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------ poisson rate ratio


def _prr_ref(date_counts):
    t1 = sum(1 for d in date_counts if d.isoweekday() < 6)
    t2 = sum(1 for d in date_counts if d.isoweekday() >= 6)
    x1 = float(sum(c for d, c in date_counts.items()
                   if d.isoweekday() < 6))
    x2 = float(sum(c for d, c in date_counts.items()
                   if d.isoweekday() >= 6))
    rr = (x1 / t1) / (x2 / t2)
    se = math.sqrt(1 / x1 + 1 / x2)
    p0 = t1 / (t1 + t2)
    nn = x1 + x2
    cc = 0.5 if x1 > nn * p0 else (-0.5 if x1 < nn * p0 else 0.0)
    zc = (x1 - nn * p0 - cc) / math.sqrt(nn * p0 * (1 - p0))
    verdict = "rates_differ" if abs(zc) > 1.96 else "rates_consistent"
    return (t1, t2, int(x1), int(x2), _r(x1 / t1, 2), _r(x2 / t2, 2),
            _r(rr), _r(rr * math.exp(-1.96 * se)),
            _r(rr * math.exp(1.96 * se)), _r(zc), verdict)


def _month_of_counts(fn):
    """fn(date) -> count; March 2024, Mar 4 is a Monday."""
    base = datetime.date(2024, 3, 4)
    return {base + datetime.timedelta(days=i):
            fn(base + datetime.timedelta(days=i)) for i in range(28)}


def test_prr_weekend_heavier(spark, tmp_path):
    dc = _month_of_counts(
        lambda d: 80 + d.day % 5 if d.isoweekday() >= 6
        else 55 + d.day % 7)
    _write_events_by_date(spark, tmp_path, dc)
    got = q_poisson_rate_ratio(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _prr_ref(dc)
    assert got[0]["verdict"] == "rates_differ"
    assert got[0]["rate_ratio"] < 1.0 and got[0]["rr_hi95"] < 1.0
    assert got[0]["weekdays"] == 20 and got[0]["weekend_days"] == 8


def test_prr_equal_rates_consistent(spark, tmp_path):
    dc = _month_of_counts(lambda d: 60 + d.day % 3)
    _write_events_by_date(spark, tmp_path, dc)
    r = q_poisson_rate_ratio(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _prr_ref(dc)
    assert r["verdict"] == "rates_consistent"
    assert r["rr_lo95"] < 1.0 < r["rr_hi95"]


def test_prr_exposure_correction(spark, tmp_path):
    # SAME per-day rate, but truncated month (fewer weekend days):
    # a raw-total comparison would scream; the rate test must not
    base = datetime.date(2024, 3, 4)
    dc = {base + datetime.timedelta(days=i): 60 for i in range(12)}
    _write_events_by_date(spark, tmp_path, dc)  # 10 weekdays, 2 wkend
    r = q_poisson_rate_ratio(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _prr_ref(dc)
    assert r["verdict"] == "rates_consistent"
    assert r["rate_ratio"] == 1.0


# ------------------------------------------------------- truncation loss


def _write_docs_ncs(spark, path, ncs):
    spark.createDataFrame(
        [(i, "w", "en", "s", n) for i, n in enumerate(ncs, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _tl_ref(ncs):
    vals = [float(n) for n in ncs if n > 0]
    n = len(vals)
    sv = sorted(vals)
    pos = (n - 1) * 0.10
    lo, hi = sv[int(math.floor(pos))], sv[int(math.ceil(pos))]
    cut = lo + (hi - lo) * (pos - math.floor(pos))
    lns = [math.log(x) for x in vals]
    mu = sum(lns) / n
    sig = math.sqrt(sum((v - mu) ** 2 for v in lns) / (n - 1))
    mass_meas = sum(1 for x in vals if x < cut) / n
    kept = [x for x in vals if x >= cut]
    km_meas = sum(kept) / len(kept)
    mass_mod = _pnorm((math.log(cut) - mu) / sig)
    km_mod = (math.exp(mu + sig * sig / 2)
              * (1 - _pnorm((math.log(cut) - mu - sig * sig) / sig))
              / (1 - _pnorm((math.log(cut) - mu) / sig)))
    rel = abs(km_mod - km_meas) / km_meas
    verdict = ("lognormal_plan_ok"
               if rel < 0.10 and abs(mass_mod - mass_meas) < 0.05
               else "use_empirical_plan")
    return (n, _r(cut, 1), _r(mass_meas), _r(mass_mod), _r(km_meas, 1),
            _r(km_mod, 1), _r(rel), verdict)


def test_tl_lognormal_corpus_plan_ok(spark, tmp_path):
    ncs = [max(1, int(round(math.exp(5.0 + 0.9 * _qnorm((i - 0.5) / 200)))))
           for i in range(1, 201)]
    _write_docs_ncs(spark, tmp_path, ncs)
    got = q_truncation_loss_estimate(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _tl_ref(ncs)
    assert got[0]["verdict"] == "lognormal_plan_ok"
    assert got[0]["kept_mean_rel_err"] < 0.03


def test_tl_bimodal_corpus_rejected(spark, tmp_path):
    # a heavy short-doc mode the lognormal can't see: model misses
    # the cutoff mass badly
    ncs = [3] * 60 + [max(1, int(round(math.exp(
        6.0 + 0.3 * _qnorm((i - 0.5) / 140))))) for i in range(1, 141)]
    _write_docs_ncs(spark, tmp_path, ncs)
    r = q_truncation_loss_estimate(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tl_ref(ncs)
    assert r["verdict"] == "use_empirical_plan"


# ------------------------------------------------------------------- gESD


def _gesd_ref(date_counts):
    vals = {}
    for d, c in date_counts.items():
        ep = (datetime.datetime(d.year, d.month, d.day)
              - datetime.datetime(1970, 1, 1)).days
        vals[ep] = vals.get(ep, 0.0) + c
    n = float(len(vals))
    rem = dict(vals)
    rows = []
    for i in (1, 2, 3):
        m = sum(rem.values()) / len(rem)
        sd = math.sqrt(sum((v - m) ** 2 for v in rem.values())
                       / (len(rem) - 1))
        day, ri = sorted(((d, abs(v - m) / sd) for d, v in rem.items()),
                         key=lambda t: (-t[1], t[0]))[0]
        zq = _qnorm(1 - 0.05 / (2 * (n - i + 1)))
        nu = n - i - 1
        tq = (zq + (zq ** 3 + zq) / (4 * nu)
              + (5 * zq ** 5 + 16 * zq ** 3 + 3 * zq) / (96 * nu ** 2)
              + (3 * zq ** 7 + 19 * zq ** 5 + 17 * zq ** 3 - 15 * zq)
              / (384 * nu ** 3))
        li = (n - i) * tq / math.sqrt((n - i - 1 + tq * tq) * (n - i + 1))
        rows.append([i, day, _r(ri), _r(li)])
        del rem[day]
    kmax = max([i for i, _d, r_, l_ in rows if r_ > l_] or [0])
    return [(i, d, r_, l_, 1 if i <= kmax else 0)
            for i, d, r_, l_ in rows]


def test_gesd_masking_pair_caught(spark, tmp_path):
    # two adjacent spike days mask each other for Grubbs; gESD's
    # backwards rule flags both (round-2 R exceeds round-1's)
    base = datetime.date(2024, 3, 4)
    dc = {}
    for i in range(28):
        d = base + datetime.timedelta(days=i)
        dc[d] = 55 + i % 7 + (400 if i == 13 else 0) \
            + (380 if i == 14 else 0)
    _write_events_by_date(spark, tmp_path, dc)
    got = q_gesd_daily_outliers(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _gesd_ref(dc)
    assert [r["is_outlier"] for r in got] == [1, 1, 0]
    assert got[1]["r_i"] > got[0]["r_i"]  # the masking signature


def test_gesd_quiet_month_no_outliers(spark, tmp_path):
    base = datetime.date(2024, 3, 4)
    dc = {base + datetime.timedelta(days=i): 55 + (i * 13) % 9
          for i in range(28)}
    _write_events_by_date(spark, tmp_path, dc)
    got = q_gesd_daily_outliers(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _gesd_ref(dc)
    assert [r["is_outlier"] for r in got] == [0, 0, 0]


# ------------------------------------------------------------ plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    base = datetime.date(2024, 3, 4)
    dc = {base + datetime.timedelta(days=i): 20 + i for i in range(14)}
    _write_events_by_date(spark, tmp_path, dc)
    for fn in (q_poisson_rate_ratio, q_gesd_daily_outliers):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    _write_docs_ncs(spark, tmp_path, list(range(50, 120)))
    plan = q_truncation_loss_estimate(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan
