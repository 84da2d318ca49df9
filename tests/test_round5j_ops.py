"""Round-5 batch-19 operators on crafted inputs with hand-computed
expectations: customer_active_streaks (gaps-and-islands month runs),
naive_forecast_backtest (contiguity-guarded lag-1 vs lag-24 MAE),
order_bundle_profile (lines-per-order economics)."""

from __future__ import annotations

import datetime as dt

from pdf_extractor_spark.queries import (
    q_customer_active_streaks,
    q_naive_forecast_backtest,
    q_order_bundle_profile,
)

_EPOCH = dt.datetime(1970, 1, 1)


# ----------------------------------------------------- customer_active_streaks


def test_streak_islands_and_histogram(spark, tmp_path):
    def o(cust, y, m):
        return (cust, dt.datetime(y, m, 15))

    rows = [
        o(1, 2024, 1), o(1, 2024, 1),          # same-month dedup
        o(1, 2024, 2), o(1, 2024, 3), o(1, 2024, 6),   # runs 3 and 1 -> 3
        o(2, 2024, 1),                                  # run 1
        o(3, 2024, 2), o(3, 2024, 4), o(3, 2024, 5),   # runs 1 and 2 -> 2
    ]
    spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r["streak_months"]: r
           for r in q_customer_active_streaks(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    for k in (1, 2, 3):
        assert out[k]["n_customers"] == 1
        assert out[k]["customer_share"] == 0.3333


# ----------------------------------------------------- naive_forecast_backtest


def test_backtest_seasonal_wins_and_sparse_exclusion(spark, tmp_path):
    rows = []
    eid = 0
    # dense type: hours 0..25, 10 events each except a spike repeated at
    # the same hour-of-day (hours 1 and 25); scored hours are 24
    # (errs 0/0) and 25 (naive err 10, seasonal err 0)
    for h in range(26):
        n = 20 if h in (1, 25) else 10
        for i in range(n):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=h * 3600 + i),
                         1, "dense"))
    # sparse type: hours 0, 24, 25 only -> no contiguous lag-24 anywhere
    for h in (0, 24, 25):
        eid += 1
        rows.append((eid, _EPOCH + dt.timedelta(seconds=h * 3600 + 5),
                     2, "sparse"))
    spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, ts, u, t in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["event_type"]: r
           for r in q_naive_forecast_backtest(spark, str(tmp_path)).collect()}
    assert set(out) == {"dense"}  # sparse has no scoreable hour
    d = out["dense"]
    assert d["n_hours_scored"] == 2
    assert d["mae_naive"] == 5.0
    assert d["mae_seasonal"] == 0.0
    assert d["seasonal_skill"] == 0.0
    assert d["seasonal_wins"] is True


# --------------------------------------------------------- order_bundle_profile


def test_bundle_histogram_and_value_scaling(spark, tmp_path):
    rows = [
        (1, 100.0, 0.0), (1, 200.0, 0.0),   # net 300, 2 lines
        (2, 50.0, 0.5),                     # net 25, 1 line
        (3, 60.0, 0.0), (3, 40.0, 0.0),     # net 100, 2 lines
    ]
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_extendedprice double, l_discount double"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = {r["n_lines"]: r
           for r in q_order_bundle_profile(spark, str(tmp_path)).collect()}
    one, two = out[1], out[2]
    assert (one["n_orders"], one["order_share"]) == (1, 0.3333)
    assert (one["avg_net_value"], one["avg_value_per_line"]) == (25.0, 25.0)
    assert (two["n_orders"], two["order_share"]) == (2, 0.6667)
    assert (two["avg_net_value"], two["avg_value_per_line"]) == (200.0, 100.0)
