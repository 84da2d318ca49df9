"""Round-5 batch-28 operators on crafted inputs, verified against
independent Python computations: price_index_fisher (Laspeyres/Paasche/
Fisher on a two-part basket), theil_sen_trend (median pairwise slope vs
OLS under an outlier day), wilson_funnel_ci (Wilson score bounds)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _WILSON_Z,
    q_price_index_fisher,
    q_theil_sen_trend,
    q_wilson_funnel_ci,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_lineitem(spark, path, rows):
    # rows: (partkey, year, qty, extendedprice)
    spark.createDataFrame(
        [(i, pk, 1, 1, float(q), float(ep), 0.0, 0.0, "N", "O",
          dt.datetime(y, 6, 15))
         for i, (pk, y, q, ep) in enumerate(rows, 1)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


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


def _write_user_events(spark, path, rows):
    # rows: (user_id, second_offset, event_type)
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ---------------------------------------------------------- price_index_fisher


def test_fisher_index_on_two_part_basket(spark, tmp_path):
    # part 1: p0=2 (q0=10), p1=3 (q1=5); part 2: p0=4 (q0=20), p1=4 (q1=30)
    rows = [(1, 2000, 10, 20.0), (2, 2000, 20, 80.0),
            (1, 2001, 5, 15.0), (2, 2001, 30, 120.0)]
    _write_lineitem(spark, tmp_path, rows)
    out = q_price_index_fisher(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["year"] == 2001
    r = out[0]
    lasp = (3 * 10 + 4 * 20) / (2 * 10 + 4 * 20)
    paas = (3 * 5 + 4 * 30) / (2 * 5 + 4 * 30)
    assert r["n_parts"] == 2
    assert r["laspeyres"] == round(lasp, 4)
    assert r["paasche"] == round(paas, 4)
    assert r["fisher"] == round(math.sqrt(lasp * paas), 4)
    # Laspeyres >= Paasche here (price rose where quantity fell)
    assert r["laspeyres"] > r["paasche"]


def test_fisher_only_parts_in_both_years_count(spark, tmp_path):
    # part 9 traded only in 2001 -> excluded; surviving part has p1/p0 = 2
    rows = [(1, 2000, 10, 10.0), (1, 2001, 10, 20.0), (9, 2001, 5, 50.0)]
    _write_lineitem(spark, tmp_path, rows)
    r = q_price_index_fisher(spark, str(tmp_path)).collect()[0]
    assert r["n_parts"] == 1
    assert r["laspeyres"] == r["paasche"] == r["fisher"] == 2.0


def test_fisher_chains_consecutive_years(spark, tmp_path):
    rows = [(1, 2000, 10, 10.0), (1, 2001, 10, 11.0), (1, 2002, 10, 12.1)]
    _write_lineitem(spark, tmp_path, rows)
    out = {r["year"]: r for r in
           q_price_index_fisher(spark, str(tmp_path)).collect()}
    assert set(out) == {2001, 2002}
    assert out[2001]["fisher"] == 1.1
    assert out[2002]["fisher"] == 1.1


# ------------------------------------------------------------- theil_sen_trend


def _python_theil_sen(counts):
    days = list(range(len(counts)))
    slopes = sorted(
        (counts[j] - counts[i]) / (days[j] - days[i])
        for i in range(len(days)) for j in range(i + 1, len(days)))
    slope = slopes[math.ceil(len(slopes) / 2) - 1]
    resid = sorted(c - slope * d for d, c in zip(days, counts))
    icept = resid[math.ceil(len(resid) / 2) - 1]
    return slope, icept, len(slopes)


def test_theil_sen_resists_one_outlier_day(spark, tmp_path):
    # clean slope +2/day, one 10x spike on day 5 (off-center, so it has
    # leverage on OLS; a mean-day spike would leave OLS untouched)
    counts = [10, 12, 14, 16, 18, 140, 22]
    _write_daily_counts(spark, tmp_path, counts)
    slope, icept, n_pairs = _python_theil_sen([float(c) for c in counts])
    r = q_theil_sen_trend(spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["n_pairs"]) == (7, n_pairs)
    assert r["ts_slope"] == round(slope, 4)
    assert r["ts_intercept"] == round(icept, 4)
    assert r["trend"] == "up"
    # the robust slope stays near 2; OLS is dragged by the spike
    assert abs(r["ts_slope"] - 2.0) <= 0.5
    assert r["slope_gap"] == round(abs(r["ols_slope"] - r["ts_slope"]), 4)
    assert r["slope_gap"] > 1.0


def test_theil_sen_exact_line_recovers_slope_and_ols_agrees(spark, tmp_path):
    counts = [5, 8, 11, 14, 17]   # c = 5 + 3*day
    _write_daily_counts(spark, tmp_path, counts)
    r = q_theil_sen_trend(spark, str(tmp_path)).collect()[0]
    assert r["ts_slope"] == 3.0
    assert r["ts_intercept"] == 5.0
    assert r["ols_slope"] == 3.0
    assert r["slope_gap"] == 0.0
    assert r["trend"] == "up"


def test_theil_sen_flat_series(spark, tmp_path):
    _write_daily_counts(spark, tmp_path, [7, 7, 7, 7])
    r = q_theil_sen_trend(spark, str(tmp_path)).collect()[0]
    assert r["ts_slope"] == 0.0
    assert r["trend"] == "flat"


# ------------------------------------------------------------ wilson_funnel_ci


def _wilson(nc, nb):
    p = nc / nb
    z = _WILSON_Z
    den = 1 + z * z / nb
    ctr = (p + z * z / (2 * nb)) / den
    half = z * math.sqrt(p * (1 - p) / nb + z * z / (4 * nb * nb)) / den
    return round(ctr - half, 4), round(ctr + half, 4)


def test_wilson_bounds_match_formula(spark, tmp_path):
    # 4 users view; 2 of them click later; 1 of those purchases later
    rows = []
    for u in range(1, 5):
        rows.append((u, u * 100, "view"))
    for u in (1, 2):
        rows.append((u, u * 100 + 10, "click"))
    rows.append((1, 150, "purchase"))
    _write_user_events(spark, tmp_path, rows)
    out = {r["step"]: r for r in
           q_wilson_funnel_ci(spark, str(tmp_path)).collect()}
    vc, cp = out["view->click"], out["click->purchase"]
    assert (vc["n_base"], vc["n_converted"], vc["rate"]) == (4, 2, 0.5)
    assert (cp["n_base"], cp["n_converted"], cp["rate"]) == (2, 1, 0.5)
    assert (vc["wilson_lo"], vc["wilson_hi"]) == _wilson(2, 4)
    assert (cp["wilson_lo"], cp["wilson_hi"]) == _wilson(1, 2)
    # smaller n -> wider interval at the same rate
    assert (cp["wilson_hi"] - cp["wilson_lo"]
            > vc["wilson_hi"] - vc["wilson_lo"])
    # Wilson never escapes [0, 1] even at p = 0.5 with n = 2
    assert 0.0 <= cp["wilson_lo"] <= cp["wilson_hi"] <= 1.0


def test_wilson_zero_base_degrades_to_null(spark, tmp_path):
    # purchases only: nobody reaches 'view', so both steps have 0 base
    _write_user_events(spark, tmp_path, [(1, 100, "purchase")])
    out = {r["step"]: r for r in
           q_wilson_funnel_ci(spark, str(tmp_path)).collect()}
    for step in ("view->click", "click->purchase"):
        r = out[step]
        assert r["n_base"] == 0 and r["n_converted"] == 0
        assert r["rate"] is None
        assert r["wilson_lo"] is None and r["wilson_hi"] is None
