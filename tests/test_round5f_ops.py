"""Round-5 batch-15 operators on crafted inputs, verified against
hand/numpy-computed expectations: benford_value_audit (first-digit law
with exact micro-unit digit extraction), price_qty_elasticity (OLS
moments with ANSI-safe degenerate guards), fd_violation_audit (the
functional-dependency profiling battery)."""

from __future__ import annotations

import math

from pdf_extractor_spark.queries import (
    q_benford_value_audit,
    q_fd_violation_audit,
    q_price_qty_elasticity,
)


# --------------------------------------------------------- benford_value_audit


def test_benford_digits_shares_and_chi2(spark, tmp_path):
    vals = [1.2, 19.0, 0.25, 3.5, 300.0, 999.0, -5.0, 0.0]
    # digits: 1,1,2,3,3,9; -5 and 0 excluded by the positivity filter
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "event_id bigint, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    rows = q_benford_value_audit(spark, str(tmp_path)).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    got = {r["digit"]: r for r in rows}
    assert [got[d]["n"] for d in range(1, 10)] == [2, 1, 2, 0, 0, 0, 0, 0, 1]
    assert got[1]["share"] == round(2 / 6, 4)
    assert got[4]["share"] == 0.0
    for d in range(1, 10):
        assert got[d]["benford_share"] == round(math.log10(1 + 1 / d), 4)
    n = {1: 2, 2: 1, 3: 2, 9: 1}
    chi2 = sum(
        (n.get(d, 0) - 6 * math.log10(1 + 1 / d)) ** 2
        / (6 * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert got[1]["chi2_total"] == round(chi2, 2)
    assert got[1]["gap"] == round(2 / 6 - math.log10(2), 4)


def test_benford_empty_after_filter_yields_zero_grid(spark, tmp_path):
    spark.createDataFrame(
        [(1, -1.0), (2, 0.0)], "event_id bigint, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    rows = q_benford_value_audit(spark, str(tmp_path)).collect()
    assert len(rows) == 9
    assert all(r["n"] == 0 and r["share"] == 0.0 for r in rows)


# -------------------------------------------------------- price_qty_elasticity


def test_elasticity_exact_slope_and_degenerate_guard(spark, tmp_path):
    rows = []
    # flag N: ln(qty) = 2 * ln(price) exactly -> slope 2, r = 1
    for k in (1, 2, 3):
        rows.append(("N", math.exp(k), math.exp(2 * k)))
    # flag R: constant price -> var_x = 0 -> NULL slope, no divide error
    for q in (1.0, 2.0, 3.0):
        rows.append(("R", 5.0, q))
    spark.createDataFrame(
        [(f, p, q) for f, p, q in rows],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = {r["l_returnflag"]: r
           for r in q_price_qty_elasticity(spark, str(tmp_path)).collect()}
    n, r_ = out["N"], out["R"]
    assert n["n_pairs"] == 3
    assert n["slope"] == 2.0
    assert abs(n["intercept"]) == 0.0
    assert n["corr_r"] == 1.0 and n["r2"] == 1.0
    assert r_["slope"] is None and r_["corr_r"] is None and r_["r2"] is None


# --------------------------------------------------------- fd_violation_audit


def test_fd_battery_verdicts(spark, tmp_path):
    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/{name}.parquet")

    w("nation", "n_nationkey int, n_regionkey int", [(1, 10), (2, 20)])
    w("part", "p_brand string, p_type string",
      [("B1", "T1"), ("B1", "T2"), ("B2", "T1")])
    w("orders", "o_custkey bigint, o_orderpriority string",
      [(1, "P1"), (1, "P2"), (2, "P1")])
    w("documents", "lang string, source string",
      [("en", "a"), ("en", "b"), ("de", "a")])
    w("customer", "c_nationkey int, c_mktsegment string",
      [(1, "A"), (1, "A"), (2, "A"), (2, "B")])

    out = {r["fd"]: r for r in q_fd_violation_audit(spark, str(tmp_path)).collect()}
    assert len(out) == 5
    hold = out["nation.nationkey->regionkey"]
    assert (hold["n_lhs"], hold["n_violating"], hold["max_distinct_rhs"],
            hold["holds"]) == (2, 0, 1, True)
    for fd in ("part.brand->type", "orders.custkey->priority",
               "documents.lang->source", "customer.nationkey->segment"):
        r = out[fd]
        assert (r["n_lhs"], r["n_violating"], r["violation_share"],
                r["max_distinct_rhs"], r["holds"]) == (2, 1, 0.5, 2, False)
