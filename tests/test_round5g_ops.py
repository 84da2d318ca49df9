"""Round-5 batch-16 operators on crafted inputs with hand-computed
expectations: bracket_balance_audit (delimiter well-formedness census),
cohort_ltv_curve (weekly-cohort cumulative value per user),
retail_price_realization (catalog-vs-realized price reconciliation)."""

from __future__ import annotations

import datetime as dt

from pdf_extractor_spark.queries import (
    q_bracket_balance_audit,
    q_cohort_ltv_curve,
    q_retail_price_realization,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


# -------------------------------------------------------- bracket_balance_audit


def test_bracket_balance_flags_per_source(spark, tmp_path):
    docs = [
        (1, '(ok) [fine] {good} "quoted"', "a"),    # fully balanced
        (2, '(unclosed [and {all " odd', "a"),      # all four flags trip
        (3, "())", "b"),                            # paren count gap only
        (4, None, "b"),                             # NULL text is clean
    ]
    spark.createDataFrame(
        [(i, t, "en", s, len(t or "")) for i, t, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r["source"]: r
           for r in q_bracket_balance_audit(spark, str(tmp_path)).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_paren_bad"], a["n_bracket_bad"],
            a["n_brace_bad"], a["n_quote_odd"]) == (2, 1, 1, 1, 1)
    assert a["unbalanced_share"] == 0.5
    assert (b["n_docs"], b["n_paren_bad"], b["n_bracket_bad"],
            b["n_brace_bad"], b["n_quote_odd"]) == (2, 1, 0, 0, 0)
    assert b["unbalanced_share"] == 0.5


# ------------------------------------------------------------- cohort_ltv_curve


def test_cohort_ltv_cumulative_per_user(spark, tmp_path):
    rows = [
        # u1: cohort week 0; week-0 value 4+6, week-1 value 5
        (1, _wk(0), 1, 4.0), (2, _wk(0, 7200), 1, 6.0), (3, _wk(1), 1, 5.0),
        # u2: cohort week 0, week 0 only
        (4, _wk(0), 2, 2.0),
        # u3: cohort week 1
        (5, _wk(1), 3, 7.0),
    ]
    spark.createDataFrame(
        [(i, ts, u, v, "view", "{}") for i, ts, u, v in rows],
        "event_id bigint, ts timestamp, user_id bigint, value double,"
        " event_type string, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {(r["cohort_week"] - _BASE_WEEK, r["age_weeks"]): r
           for r in q_cohort_ltv_curve(spark, str(tmp_path)).collect()}
    assert set(out) == {(0, 0), (0, 1), (1, 0)}
    r00 = out[(0, 0)]
    assert (r00["active_users"], r00["cohort_size"], r00["value_sum"],
            r00["cum_value_per_user"]) == (2, 2, 12.0, 6.0)
    r01 = out[(0, 1)]
    assert (r01["active_users"], r01["cohort_size"], r01["value_sum"],
            r01["cum_value_per_user"]) == (1, 2, 5.0, 8.5)
    r10 = out[(1, 0)]
    assert (r10["active_users"], r10["cohort_size"], r10["value_sum"],
            r10["cum_value_per_user"]) == (1, 1, 7.0, 7.0)


# ----------------------------------------------------- retail_price_realization


def test_retail_price_realization_ratios_and_null_guard(spark, tmp_path):
    spark.createDataFrame(
        [(1, "B1", 10.0), (2, "B1", 5.0), (3, "B2", 0.0)],
        "p_partkey bigint, p_brand string, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [
            (1, 60.0, 6.0), (1, 40.0, 4.0),  # unit 10.0 -> ratio 1.0
            (2, 12.0, 2.0),                  # unit 6.0 -> ratio 1.2 (off)
            (3, 5.0, 1.0),                   # retail 0 -> NULL ratio
        ],
        "l_partkey bigint, l_extendedprice double, l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = {r["p_brand"]: r
           for r in q_retail_price_realization(spark, str(tmp_path)).collect()}
    b1, b2 = out["B1"], out["B2"]
    assert (b1["n_parts"], b1["n_rated"]) == (2, 2)
    assert b1["mean_realization"] == 1.1
    assert b1["min_realization"] == 1.0 and b1["max_realization"] == 1.2
    assert b1["off_by_10pct_share"] == 0.5
    assert (b2["n_parts"], b2["n_rated"]) == (1, 0)
    assert b2["mean_realization"] is None
    assert b2["off_by_10pct_share"] == 0.0
