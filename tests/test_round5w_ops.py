"""Round-5 batch-32 operators on crafted inputs, verified against
independent Python computations: mann_kendall_trend (tie-corrected S/z),
friedman_event_types (mid-rank chi2 + Kendall's W), and
two_proportion_power_plan (per-arm n from the measured base rate)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _POWER_LIFTS,
    _Z_ALPHA2,
    _Z_BETA,
    q_friedman_event_types,
    q_mann_kendall_trend,
    q_two_proportion_power_plan,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=i),
                         1, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_typed_days(spark, path, day_type_counts):
    # day_type_counts: {day: {event_type: n}}
    rows, eid = [], 0
    for d, tc in day_type_counts.items():
        for et, n in tc.items():
            for i in range(n):
                eid += 1
                rows.append((eid,
                             _EPOCH + dt.timedelta(days=d, seconds=eid),
                             1, et, 10.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ----------------------------------------------------------- mann_kendall_trend


def _python_mk(counts):
    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n) for j in range(i + 1, n))
    from collections import Counter
    ties = Counter(counts)
    tie_term = sum(t * (t - 1) * (2 * t + 5)
                   for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var, z


def test_mk_monotone_series_is_significant_up(spark, tmp_path):
    counts = [10, 12, 14, 17, 19, 23, 26, 30, 31, 35]
    _write_daily_counts(spark, tmp_path, counts)
    s, var, z = _python_mk(counts)
    r = q_mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 10
    assert r["s_stat"] == s == 45          # all pairs increasing
    assert r["var_s"] == round(var, 4)
    assert r["z"] == round(z, 4)
    assert r["tau_a"] == 1.0
    assert r["trend"] == "up"


def test_mk_tie_correction_matches_python(spark, tmp_path):
    counts = [10, 10, 12, 12, 12, 11, 15, 10, 16, 17]
    _write_daily_counts(spark, tmp_path, counts)
    s, var, z = _python_mk(counts)
    r = q_mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert r["s_stat"] == s
    assert r["var_s"] == round(var, 4)
    assert r["z"] == round(z, 4)


def test_mk_flat_series_zero(spark, tmp_path):
    _write_daily_counts(spark, tmp_path, [10, 11, 10, 11, 10, 11])
    r = q_mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert r["trend"] == "none"
    assert abs(r["z"]) < 1.96


# --------------------------------------------------------- friedman_event_types


def _python_friedman(day_type_counts, types):
    n = len(day_type_counts)
    k = len(types)
    rj = {t: 0.0 for t in types}
    for tc in day_type_counts.values():
        vals = [(tc.get(t, 0), t) for t in types]
        by_count = sorted(vals)
        ranks = {}
        i = 0
        while i < len(by_count):
            j = i
            while j + 1 < len(by_count) and by_count[j + 1][0] == by_count[i][0]:
                j += 1
            avg = (i + j) / 2 + 1
            for m in range(i, j + 1):
                ranks[by_count[m][1]] = avg
            i = j + 1
        for t in types:
            rj[t] += ranks[t]
    ss = sum((v - n * (k + 1) / 2) ** 2 for v in rj.values())
    chi2 = 12 * ss / (n * k * (k + 1))
    return chi2, chi2 / (n * (k - 1)), max(rj.values()), min(rj.values())


def test_friedman_stable_ordering_maximal_w(spark, tmp_path):
    # same strict ordering every day: view > click > error
    days = {d: {"view": 30 + d, "click": 20 + d, "error": 5 + d}
            for d in range(6)}
    _write_typed_days(spark, tmp_path, days)
    chi2, w, mx, mn = _python_friedman(days, ["view", "click", "error"])
    r = q_friedman_event_types(spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["n_types"], r["df"]) == (6, 3, 2)
    assert r["chi2_friedman"] == round(chi2, 4)
    assert r["kendalls_w"] == 1.0        # perfect agreement
    assert float(r["max_rank_sum"]) == mx == 18.0   # 3 * 6 days
    assert float(r["min_rank_sum"]) == mn == 6.0


def test_friedman_absent_type_ranks_as_zero(spark, tmp_path):
    # 'error' absent on day 1 -> dense grid gives it count 0, rank 1
    days = {0: {"view": 10, "error": 3},
            1: {"view": 8},
            2: {"view": 9, "error": 2}}
    _write_typed_days(spark, tmp_path, days)
    chi2, w, mx, mn = _python_friedman(days, ["view", "error"])
    r = q_friedman_event_types(spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["n_types"]) == (3, 2)
    assert r["chi2_friedman"] == round(chi2, 4)
    assert r["kendalls_w"] == round(w, 4)


# ---------------------------------------------------- two_proportion_power_plan


def test_power_plan_formula_on_known_rate(spark, tmp_path):
    # 2 days, 100 events/day, 10% purchase rate
    rows, eid = [], 0
    for d in range(2):
        for i in range(100):
            eid += 1
            et = "purchase" if i < 10 else "view"
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=i),
                         1, et, 10.0, "{}"))
    import pyspark.sql.types as T  # noqa: F401  (schema via DDL below)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["lift"]: r for r in
           q_two_proportion_power_plan(spark, str(tmp_path)).collect()}
    assert set(out) == set(_POWER_LIFTS)
    p1 = 0.1
    for lift in _POWER_LIFTS:
        p2 = p1 * (1 + lift)
        n = math.ceil((_Z_ALPHA2 + _Z_BETA) ** 2
                      * (p1 * (1 - p1) + p2 * (1 - p2)) / (p2 - p1) ** 2)
        r = out[lift]
        assert r["p_base"] == 0.1
        assert r["p_target"] == round(p2, 4)
        assert r["n_per_arm"] == n
        assert r["days_needed"] == math.ceil(2 * n / 100)  # 100 events/day
    # smaller lift needs more samples
    assert out[0.01]["n_per_arm"] > out[0.10]["n_per_arm"]
