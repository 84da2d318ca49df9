"""Round-5 batch-24 operators on crafted inputs with hand-computed
expectations: km_survival_weekly (censoring-aware product-limit curve),
kendall_tau_sources (tau-b with tie corrections), jackknife_source_ci
(closed-form delete-one cluster SE)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_jackknife_source_ci,
    q_kendall_tau_sources,
    q_km_survival_weekly,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


# ----------------------------------------------------------- km_survival_weekly


def test_km_product_limit_with_censoring(spark, tmp_path):
    spans = {1: (0, 3), 2: (0, 1), 3: (0, 0), 4: (1, 2), 5: (2, 3)}
    rows, eid = [], 0
    for uid, (a, b) in spans.items():
        for w in (a, b):
            eid += 1
            rows.append((eid, _wk(w, eid), uid, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["age_weeks"]: r
           for r in q_km_survival_weekly(spark, str(tmp_path)).collect()}
    # ages: u3 dies at 0; u2,u4 die at 1, u5 censored at 1 (ends week 3);
    # u1 censored at 3
    assert set(out) == {0, 1, 3}
    a0, a1, a3 = out[0], out[1], out[3]
    assert (a0["n_at_risk"], a0["n_churned"], a0["n_censored"]) == (5, 1, 0)
    assert a0["km_survival"] == 0.8
    assert (a1["n_at_risk"], a1["n_churned"], a1["n_censored"]) == (4, 2, 1)
    assert a1["km_survival"] == 0.4  # 0.8 * (1 - 2/4)
    assert (a3["n_at_risk"], a3["n_churned"], a3["n_censored"]) == (1, 0, 1)
    assert a3["km_survival"] == 0.4  # censoring never drops the curve


# ---------------------------------------------------------- kendall_tau_sources


def test_tau_b_with_ties(spark, tmp_path):
    src_docs = {"a": [10], "b": [20, 20], "c": [5, 5, 5], "d": [10]}
    docs, i = [], 0
    for s, lens in src_docs.items():
        for n in lens:
            docs.append((i, "x", "en", s, n))
            i += 1
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = q_kendall_tau_sources(spark, str(tmp_path)).collect()[0]
    # pairs: ab conc, ac disc, ad tie-both, bc disc, bd conc, cd disc
    assert row["n_pairs"] == 6
    assert (row["concordant"], row["discordant"]) == (2, 3)
    assert (row["ties_volume"], row["ties_length"]) == (1, 1)
    assert row["kendall_tau_b"] == round((2 - 3) / math.sqrt(5 * 5), 4)


# ---------------------------------------------------------- jackknife_source_ci


def test_jackknife_closed_form(spark, tmp_path):
    src_docs = {"a": [10, 20], "b": [30, 40]}
    docs, i = [], 0
    for s, lens in src_docs.items():
        for n in lens:
            docs.append((i, "x", "en", s, n))
            i += 1
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = q_jackknife_source_ci(spark, str(tmp_path)).collect()[0]
    assert (row["n_docs"], row["n_sources"], row["corpus_mean"]) == (4, 2, 25.0)
    assert row["naive_se"] == round(math.sqrt(125.0 / 4), 4)
    # delete-one means 35 and 15; ssd = 200; se = sqrt(1/2 * 200) = 10
    assert row["jackknife_se"] == 10.0
    assert row["se_inflation"] == round(10 / math.sqrt(125.0 / 4), 4)
    assert (row["ci_lo"], row["ci_hi"]) == (5.4, 44.6)  # 25 -/+ 1.96*10
