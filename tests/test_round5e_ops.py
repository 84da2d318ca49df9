"""Round-5 batch-14 operators on crafted inputs, verified against
hand-computed expectations (not just the DuckDB oracles the contract
suite replays): wau_growth_accounting (the WAU bridge identity),
power_user_curve (L7 active-day histogram), order_line_status_consistency
and order_total_reconciliation (cross-table state/money audits),
register_profile (pronoun/question register rates), and
segment_priority_affinity (contingency chi-square)."""

from __future__ import annotations

import datetime as dt

from pdf_extractor_spark.queries import (
    q_order_line_status_consistency,
    q_order_total_reconciliation,
    q_power_user_curve,
    q_register_profile,
    q_segment_priority_affinity,
    q_wau_growth_accounting,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800  # an arbitrary epoch-week; ops use floor(epoch/604800)


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    """A timestamp inside epoch-week _BASE_WEEK + w (session tz is UTC)."""
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id)."""
    spark.createDataFrame(
        [(i, ts, u, "view", 0.0, "{}") for i, ts, u in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------ wau_growth_accounting


def test_wau_growth_bridge_identity(spark, tmp_path):
    # u1 active weeks 0,1,2; u2 weeks 0,2 (gap week 1); u3 week 1 only.
    rows = [
        (1, _wk(0), 1), (2, _wk(0, 7200), 1),  # duplicate-week event: 1 WAU
        (3, _wk(1), 1), (4, _wk(2), 1),
        (5, _wk(0), 2), (6, _wk(2), 2),
        (7, _wk(1), 3),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["week"] - _BASE_WEEK: r
           for r in q_wau_growth_accounting(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2}
    # week 0: u1,u2 both new; u2 goes dark (next active week is 2)
    assert (out[0]["wau"], out[0]["n_new"], out[0]["n_retained"],
            out[0]["n_resurrected"], out[0]["n_churned_after"]) == (2, 2, 0, 0, 1)
    # week 1: u3 new, u1 retained; u3 never returns
    assert (out[1]["wau"], out[1]["n_new"], out[1]["n_retained"],
            out[1]["n_resurrected"], out[1]["n_churned_after"]) == (2, 1, 1, 0, 1)
    # week 2: u1 retained, u2 resurrected; both churn (last week of data)
    assert (out[2]["wau"], out[2]["n_new"], out[2]["n_retained"],
            out[2]["n_resurrected"], out[2]["n_churned_after"]) == (2, 0, 1, 1, 2)
    # the bridge identity holds row by row
    for r in out.values():
        assert r["wau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]


# ----------------------------------------------------------- power_user_curve


def test_power_user_curve_histogram_and_cumulative(spark, tmp_path):
    def day(d: int, u: int, eid: int):
        # noon of day d inside week _BASE_WEEK (d in 0..6 stays in-week)
        return (eid, _wk(0, d * 86400 + 43200), u)

    rows = [day(0, 1, 1), day(0, 1, 2), day(1, 1, 3), day(2, 1, 4)]  # u1: 3 days
    rows += [day(3, 2, 5)]                                           # u2: 1 day
    rows += [day(4, 3, 6)]                                           # u3: 1 day
    rows += [day(d, 4, 7 + d) for d in range(7)]                     # u4: 7 days
    _write_events(spark, tmp_path, rows)
    out = q_power_user_curve(spark, str(tmp_path)).collect()
    assert [(r["active_days"], r["n_users"]) for r in out] == [
        (1, 2), (3, 1), (7, 1)
    ]
    got = {r["active_days"]: (r["user_share"], r["share_at_least"]) for r in out}
    assert got[1] == (0.5, 1.0)     # everyone is >=1-day active
    assert got[3] == (0.25, 0.5)    # u1 and u4 are >=3-day actives
    assert got[7] == (0.25, 0.25)   # only u4 is a 7/7 user


# --------------------------------------------- order_line_status_consistency


def test_order_line_status_consistency_counts(spark, tmp_path):
    spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "O"), (4, "O")],
        "o_orderkey bigint, o_orderstatus string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (1, "F"), (1, "F"),            # o1: fully shipped, consistent
            (2, "O"), (2, "F"),            # o2: closed header, open line
            (3, "F"),                      # o3: open header, fully shipped
            (4, "O"), (4, "F"),            # o4: open header, mixed lines
        ],
        "l_orderkey bigint, l_linestatus string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = {r["o_orderstatus"]: r
           for r in q_order_line_status_consistency(spark, str(tmp_path)).collect()}
    f, o = out["F"], out["O"]
    assert (f["n_orders"], f["n_mixed_lines"], f["n_closed_with_open_lines"],
            f["n_open_fully_shipped"]) == (2, 1, 1, 0)
    assert f["inconsistent_share"] == 0.5
    assert (o["n_orders"], o["n_mixed_lines"], o["n_closed_with_open_lines"],
            o["n_open_fully_shipped"]) == (2, 1, 0, 1)
    assert o["inconsistent_share"] == 0.5


# ------------------------------------------------- order_total_reconciliation


def test_order_total_reconciliation_gaps_and_orphans(spark, tmp_path):
    spark.createDataFrame(
        [(1, "F", 100.0), (2, "F", 50.0), (3, "O", 10.0)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.0),  # recomputes to exactly 100.0
            (2, 100.0, 0.0, 0.0),  # header says 50 -> gap 50
            # order 3 has NO lines
        ],
        "l_orderkey bigint, l_extendedprice double, l_discount double,"
        " l_tax double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = {r["o_orderstatus"]: r
           for r in q_order_total_reconciliation(spark, str(tmp_path)).collect()}
    f, o = out["F"], out["O"]
    assert (f["n_orders"], f["n_no_lines"], f["n_reconciled"]) == (2, 0, 1)
    assert f["avg_abs_gap"] == 25.0 and f["max_abs_gap"] == 50.0
    assert f["avg_rel_gap"] == 0.5  # (0/100 + 50/50) / 2
    assert (o["n_orders"], o["n_no_lines"], o["n_reconciled"]) == (1, 1, 0)
    assert o["avg_abs_gap"] is None and o["max_abs_gap"] is None


# ------------------------------------------------------------ register_profile


def test_register_profile_rates(spark, tmp_path):
    docs = [
        (1, "I like you. Do you?", "en", "a"),   # fp 1, sp 2, tok 5, q 1
        (2, "we went home", "en", "a"),          # fp 1, sp 0, tok 3
        (3, "nothing here", "en", "b"),
        (4, None, "en", "b"),                    # NULL text -> guards hold
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t or "")) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r["source"]: r
           for r in q_register_profile(spark, str(tmp_path)).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_tokens"]) == (2, 8)
    assert a["first_person_per_1k"] == 250.0   # (1+1)/8 * 1000
    assert a["second_person_per_1k"] == 250.0  # 2/8 * 1000
    # 1 question mark over 19+12=31 chars
    assert a["question_marks_per_1k_chars"] == round(1000.0 / 31, 4)
    assert (b["n_docs"], b["n_tokens"]) == (2, 2)
    assert (b["first_person_per_1k"], b["second_person_per_1k"],
            b["question_marks_per_1k_chars"]) == (0.0, 0.0, 0.0)


# --------------------------------------------------- segment_priority_affinity


def test_segment_priority_affinity_chi2(spark, tmp_path):
    spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "c_custkey bigint, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    # A leans P1 (30 vs 10), B leans P2 (10 vs 30); marginals 40/40/40/40.
    counts = {(1, "P1"): 20, (2, "P1"): 10, (1, "P2"): 5, (2, "P2"): 5,
              (3, "P1"): 5, (4, "P1"): 5, (3, "P2"): 15, (4, "P2"): 15}
    rows = [(ck, pr) for (ck, pr), n in counts.items() for _ in range(n)]
    spark.createDataFrame(
        rows, "o_custkey bigint, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {(r["segment"], r["priority"]): r
           for r in q_segment_priority_affinity(spark, str(tmp_path)).collect()}
    assert len(out) == 4
    # every expected cell is 40*40/80 = 20; chi2 = 4 * (10^2/20) = 20
    for (seg, pri), r in out.items():
        assert r["expected"] == 20.0
        assert r["chi2_total"] == 20.0
        heavy = (seg, pri) in {("A", "P1"), ("B", "P2")}
        assert r["n_orders"] == (30 if heavy else 10)
        assert r["lift"] == (1.5 if heavy else 0.5)
        assert r["pearson_resid"] == (2.2361 if heavy else -2.2361)
