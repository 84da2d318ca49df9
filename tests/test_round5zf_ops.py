"""Round-5 batch-34 operators on crafted inputs, verified against
independent Python computations: cucconi_location_scale (joint
location-scale rank test with tie-safe permutation moments vs a direct
weighted mid-rank walk), partial_correlation_daily (first-order partial
correlations vs direct moment algebra), record_counts_test (records-test
z vs harmonic-number expectations).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_cucconi_location_scale,
    q_partial_correlation_daily,
    q_record_counts_test,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs_nchars(spark, path, rows):
    """rows: (source, n_chars); text is a synthetic pad."""
    spark.createDataFrame(
        [(i, "x", "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------- cucconi_location_scale


def _cucconi_expected(rows):
    """rows: (source, n_chars).  Returns the op's single row."""
    counts: dict[str, int] = {}
    for s, _ in rows:
        counts[s] = counts.get(s, 0) + 1
    two = sorted(counts, key=lambda s: (-counts[s], s))[:2]
    a, b = two
    pooled: dict[int, float] = {}
    for s, n in rows:
        if s in (a, b):
            pooled[n] = pooled.get(n, 0.0) + 1.0
    n_tot = sum(pooled.values())
    mid = {}
    cum = 0.0
    for x in sorted(pooled):
        t = pooled[x]
        mid[x] = cum + (t + 1) / 2.0
        cum += t
    s_of = {x: r * r for x, r in mid.items()}
    t_of = {x: (n_tot + 1 - r) ** 2 for x, r in mid.items()}
    sbar = sum(pooled[x] * s_of[x] for x in pooled) / n_tot
    tbar = sum(pooled[x] * t_of[x] for x in pooled) / n_tot
    ss2 = sum(pooled[x] * s_of[x] ** 2 for x in pooled)
    tt2 = sum(pooled[x] * t_of[x] ** 2 for x in pooled)
    st2 = sum(pooled[x] * s_of[x] * t_of[x] for x in pooled)
    na = float(counts[a])
    nb = float(counts[b])
    u = sum(s_of[n] for s, n in rows if s == a)
    v = sum(t_of[n] for s, n in rows if s == a)
    var_fac = na * nb / (n_tot * (n_tot - 1))
    us = (u - na * sbar) / math.sqrt(var_fac * (ss2 - n_tot * sbar * sbar))
    vs = (v - na * tbar) / math.sqrt(var_fac * (tt2 - n_tot * tbar * tbar))
    rho = (st2 - n_tot * sbar * tbar) / math.sqrt(
        (ss2 - n_tot * sbar * sbar) * (tt2 - n_tot * tbar * tbar))
    c = (us * us + vs * vs - 2 * rho * us * vs) / (2.0 * (1 - rho * rho))
    verdict = "location_scale_shift" if c > 2.9957 else "consistent"
    return (a, b, int(na), int(nb), round(us, 4), round(vs, 4),
            round(rho, 4), round(c, 4), round(math.exp(-c), 4), verdict)


def test_cucconi_matches_python_shifted(spark, tmp_path):
    """Source b sits higher AND wider than a: the joint test fires."""
    rows = (
        [("a", 100 + 3 * i) for i in range(30)]          # tight, low
        + [("b", 200 + 17 * i) for i in range(25)]       # high, spread
        + [("tiny", 50)]                                  # not in top 2
    )
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_cucconi_location_scale(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _cucconi_expected(rows)
    assert got[0].verdict == "location_scale_shift"


def test_cucconi_identical_with_ties_consistent(spark, tmp_path):
    """Same discrete length distribution in both sources (heavy ties):
    the tie-safe moments keep the statistic small; no false alarm."""
    rows = []
    for src in ("a", "b"):
        for n, reps in ((100, 8), (200, 8), (300, 8)):
            rows.extend((src, n) for _ in range(reps))
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_cucconi_location_scale(spark, str(tmp_path)).collect()[0]
    assert tuple(got) == _cucconi_expected(rows)
    assert got.verdict == "consistent"
    # identical samples: both standardized stats are exactly 0
    assert got.u_std == 0.0
    assert got.v_std == 0.0


# -------------------------------------------- partial_correlation_daily


def _pcorr_expected(day_counts):
    """day_counts: {type: {day: n}} for exactly three types a/b/c by
    volume rank (count desc, name)."""
    totals = {t: sum(d.values()) for t, d in day_counts.items()}
    order = sorted(totals, key=lambda t: (-totals[t], t))[:3]
    days = sorted({d for t in order for d in day_counts[t]})
    xs = {t: [float(day_counts[t].get(d, 0)) for d in days] for t in order}
    a, b, c = order
    n = float(len(days))

    def corr(u, v):
        su, sv = sum(u), sum(v)
        suu = sum(x * x for x in u)
        svv = sum(x * x for x in v)
        suv = sum(x * y for x, y in zip(u, v))
        return ((n * suv - su * sv)
                / math.sqrt((n * suu - su * su) * (n * svv - sv * sv)))

    rab = corr(xs[a], xs[b])
    rac = corr(xs[a], xs[c])
    rbc = corr(xs[b], xs[c])

    def part(rxy, rxz, ryz):
        return (rxy - rxz * ryz) / math.sqrt(
            (1 - rxz * rxz) * (1 - ryz * ryz))

    return (a, b, c, int(n), round(rab, 4), round(rac, 4), round(rbc, 4),
            round(part(rab, rac, rbc), 4),
            round(part(rac, rab, rbc), 4),
            round(part(rbc, rab, rac), 4))


def test_partial_correlation_matches_python(spark, tmp_path):
    """xb and xc each track xa (common driver) plus independent
    wiggles: raw r_bc is strongly positive, partial r_bc|a collapses."""
    base = [10, 14, 9, 22, 15, 18, 25, 13, 30, 17, 21, 12]
    wig_b = [1, -1, 2, 0, -2, 1, 0, 2, -1, 0, 1, -2]
    wig_c = [-2, 1, 0, 1, 2, -1, 1, 0, 0, -1, 2, 1]
    counts = {"view": {}, "click": {}, "error": {}}
    rows = []
    for d in range(12):
        na = base[d] * 3                      # busiest
        nb = base[d] + wig_b[d] + 5
        nc = base[d] + wig_c[d] + 3
        counts["view"][d] = na
        counts["click"][d] = nb
        counts["error"][d] = nc
        for t, k in (("view", na), ("click", nb), ("error", nc)):
            rows.extend((1, d * 86400 + i + hash(t) % 7, t)
                        for i in range(k))
    _write_events(spark, tmp_path, rows)
    got = q_partial_correlation_daily(spark, str(tmp_path)).collect()
    assert len(got) == 1
    exp = _pcorr_expected(counts)
    assert tuple(got[0]) == exp
    r = got[0]
    # the common-driver signature: raw co-movement high, partial low
    assert r.r_bc > 0.7
    assert abs(r.r_bc_given_a) < r.r_bc


def test_partial_correlation_absent_days_count_zero(spark, tmp_path):
    """A type silent on some days contributes zeros, not missing rows."""
    counts = {"view": {0: 5, 1: 7, 2: 6, 3: 9, 4: 8},
              "click": {0: 3, 2: 4, 4: 5},       # silent on days 1, 3
              "error": {0: 2, 1: 2, 2: 3, 3: 2, 4: 4}}
    rows = []
    for t, per_day in counts.items():
        for d, k in per_day.items():
            rows.extend((1, d * 86400 + i, t) for i in range(k))
    _write_events(spark, tmp_path, rows)
    got = q_partial_correlation_daily(spark, str(tmp_path)).collect()[0]
    assert tuple(got) == _pcorr_expected(counts)
    assert got.n_days == 5


# ------------------------------------------------------ record_counts_test


def _records_expected(day_counts):
    xs = [float(c) for c in day_counts]
    n = len(xs)
    rh = rl = 0
    for i, x in enumerate(xs):
        if i == 0 or x > max(xs[:i]):
            rh += 1
        if i == 0 or x < min(xs[:i]):
            rl += 1
    h1 = sum(1.0 / i for i in range(1, n + 1))
    h2 = sum(1.0 / (i * i) for i in range(1, n + 1))
    sd = math.sqrt(h1 - h2)
    zh = (rh - h1) / sd
    zl = (rl - h1) / sd
    verdict = ("variance_expansion" if zh > 1.96 and zl > 1.96
               else "trending_up" if zh > 1.96
               else "trending_down" if zl > 1.96
               else "stationary_consistent")
    return (n, rh, rl, round(h1, 4), round(sd, 4),
            round(zh, 4), round(zl, 4), verdict)


def _events_for_counts(day_counts):
    rows = []
    for d, c in enumerate(day_counts):
        rows.extend((1, d * 86400 + i, "view") for i in range(c))
    return rows


def test_records_match_python(spark, tmp_path):
    counts = [10, 14, 9, 22, 15, 18, 25, 13, 30, 17, 21, 12]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    got = q_record_counts_test(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _records_expected(counts)


def test_records_monotone_growth_trends_up(spark, tmp_path):
    """Strictly increasing series: every day is a record high, only the
    first a record low; the z flags the trend.  A repeat of the running
    max (tie) is NOT a record."""
    counts = [10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    r = q_record_counts_test(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _records_expected(counts)
    assert r.record_highs == 12
    assert r.record_lows == 1
    assert r.verdict == "trending_up"
    # tie day: re-hitting the max adds no record
    counts2 = counts + [21]
    _write_events(spark, tmp_path, _events_for_counts(counts2))
    r2 = q_record_counts_test(spark, str(tmp_path)).collect()[0]
    assert r2.record_highs == 12


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_cucconi_rides_checkpoint(spark):
    final = _final(q_cucconi_location_scale(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_partial_correlation_rides_checkpoint(spark):
    final = _final(q_partial_correlation_daily(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_records_single_scan(spark):
    final = _final(q_record_counts_test(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final
