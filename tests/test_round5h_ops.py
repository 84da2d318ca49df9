"""Round-5 batch-17 operators on crafted inputs with hand-computed
expectations: column_profile (null/cardinality battery),
last_touch_attribution (1-hour lookback credit assignment),
brand_cross_sell_lift (market-basket lift with min-support cut)."""

from __future__ import annotations

import datetime as dt

from pdf_extractor_spark.queries import (
    q_brand_cross_sell_lift,
    q_column_profile,
    q_last_touch_attribution,
)

T0 = dt.datetime(2024, 1, 1)


def _w(spark, path, name, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{name}.parquet")


# ---------------------------------------------------------------- column_profile


def test_column_profile_nulls_and_cardinality(spark, tmp_path):
    _w(spark, tmp_path, "documents", "lang string, source string",
       [("en", "a"), (None, "a"), ("en", "b")])
    _w(spark, tmp_path, "orders",
       "o_orderstatus string, o_orderpriority string",
       [("F", "P1"), ("O", "P1")])
    _w(spark, tmp_path, "events", "event_type string", [("view",)])
    _w(spark, tmp_path, "lineitem",
       "l_returnflag string, l_linestatus string",
       [("N", "O"), ("R", "O")])
    _w(spark, tmp_path, "customer", "c_mktsegment string", [("A",)])
    _w(spark, tmp_path, "part", "p_brand string, p_type string",
       [("B1", "T1")])
    rows = q_column_profile(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert [r["column_name"] for r in rows] == sorted(
        r["column_name"] for r in rows
    )
    got = {r["column_name"]: r for r in rows}
    lang = got["documents.lang"]
    assert (lang["n_rows"], lang["n_null"], lang["null_share"],
            lang["n_distinct"], lang["min_val"], lang["max_val"]) == (
        3, 1, 0.3333, 1, "en", "en")
    rf = got["lineitem.l_returnflag"]
    assert (rf["n_null"], rf["n_distinct"], rf["min_val"], rf["max_val"]) == (
        0, 2, "N", "R")
    assert got["orders.o_orderpriority"]["n_distinct"] == 1


# -------------------------------------------------------- last_touch_attribution


def test_last_touch_lookback_and_direct(spark, tmp_path):
    def e(eid, sec, uid, typ):
        return (eid, T0 + dt.timedelta(seconds=sec), uid, typ, 0.0, "{}")

    rows = [
        e(1, 0, 1, "view"), e(2, 100, 1, "purchase"),        # view credited
        e(3, 0, 2, "click"), e(4, 5000, 2, "view"),
        e(5, 9000, 2, "purchase"),                            # stale -> direct
        e(6, 0, 3, "purchase"),                               # first -> direct
        e(7, 0, 4, "error"), e(8, 10, 4, "click"),
        e(9, 20, 4, "purchase"), e(10, 30, 4, "purchase"),    # click x2
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["channel"]: r
           for r in q_last_touch_attribution(spark, str(tmp_path)).collect()}
    assert set(out) == {"click", "direct", "view"}
    assert (out["click"]["n_purchases"], out["click"]["share"]) == (2, 0.4)
    assert (out["direct"]["n_purchases"], out["direct"]["share"]) == (2, 0.4)
    assert (out["view"]["n_purchases"], out["view"]["share"]) == (1, 0.2)


# -------------------------------------------------------- brand_cross_sell_lift


def test_brand_cross_sell_lift_support_cut_and_ranking(spark, tmp_path):
    # X bought by custs 1-5, Y by 1-5, Z by 1-6; customer universe = 6
    buyers = {"BX": [1, 2, 3, 4, 5], "BY": [1, 2, 3, 4, 5],
              "BZ": [1, 2, 3, 4, 5, 6]}
    _w(spark, tmp_path, "customer", "c_custkey bigint",
       [(c,) for c in range(1, 7)])
    _w(spark, tmp_path, "part", "p_partkey bigint, p_brand string",
       [(1, "BX"), (2, "BY"), (3, "BZ")])
    _w(spark, tmp_path, "orders", "o_orderkey bigint, o_custkey bigint",
       [(c, c) for c in range(1, 7)])
    li = []
    for pk, brand in ((1, "BX"), (2, "BY"), (3, "BZ")):
        li += [(c, pk) for c in buyers[brand]]
    _w(spark, tmp_path, "lineitem", "l_orderkey bigint, l_partkey bigint", li)

    rows = q_brand_cross_sell_lift(spark, str(tmp_path)).collect()
    # all three pairs have n_both = 5 >= min support
    assert [(r["brand_a"], r["brand_b"]) for r in rows] == [
        ("BX", "BY"),   # lift 5*6/(5*5) = 1.2 ranks first
        ("BX", "BZ"),   # lift 5*6/(5*6) = 1.0, tie broken by name
        ("BY", "BZ"),
    ]
    top = rows[0]
    assert (top["n_both"], top["n_a"], top["n_b"]) == (5, 5, 5)
    assert top["support"] == round(5 / 6, 4) and top["lift"] == 1.2
    assert rows[1]["lift"] == 1.0 and rows[2]["lift"] == 1.0
