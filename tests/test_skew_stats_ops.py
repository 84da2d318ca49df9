"""Skew machinery + corpus statistics on crafted inputs: salted-join
semantics by hand, exact Zipf fit (slope -1, r2 1), unigram drift
cross-entropy computed analytically, and dedup-graph degrees on a known
clique.  Salted-vs-unsalted parity is ALSO the oracle relation in the
contract gate — the crafted test here pins the values themselves."""

from __future__ import annotations

import pandas as pd

from pdf_extractor_spark.queries import (
    q_graph_degree_stats,
    q_salted_join,
    q_unigram_drift,
    q_zipf_fit,
)


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    pdf["props"] = "{}"
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_documents(spark, path, rows):
    """rows: (doc_id, text)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "crafted"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ----------------------------------------------------------------- salted_join


def test_salted_join_values_by_hand(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:01:00", 1, "click", 2.0),
            (3, "2024-01-01 10:02:00", 1, "view", 4.0),
            (10, "2024-01-01 09:00:00", 2, "purchase", 8.0),
        ],
    )
    out = {
        (r["event_type"], r["first_type"]): (r["n_events"], r["total_value"])
        for r in q_salted_join(spark, str(tmp_path)).collect()
    }
    # user 1's first event is 'view'; user 2's is 'purchase'
    assert out[("view", "view")] == (2, 5.0)
    assert out[("click", "view")] == (1, 2.0)
    assert out[("purchase", "purchase")] == (1, 8.0)
    assert len(out) == 3  # salting fabricated no extra groups


# -------------------------------------------------------------------- zipf_fit


def test_zipf_fit_exact_power_law(spark, tmp_path):
    # frequencies 12/r at ranks 1..4: slope exactly -1, perfect fit
    text = " ".join(["aa"] * 12 + ["bb"] * 6 + ["cc"] * 4 + ["dd"] * 3)
    _write_documents(spark, tmp_path, [(0, text)])
    row = q_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert (row["zipf_exponent"], row["fit_r2"], row["n_ranks"]) == (-1.0, 1.0, 4)


# --------------------------------------------------------------- unigram_drift


def test_unigram_drift_cross_entropy_by_hand(spark, tmp_path):
    # ids 0..9 -> cutoff 7.  Old corpus: 7 docs of "a b" -> counts a=7,b=7,
    # N=14, V=2, denominator 17.  Seen-token bits: log2(17/8) = 1.087463;
    # unseen: log2(17) = 4.087463.
    rows = [(i, "a b") for i in range(7)]
    rows += [(7, "a b"), (8, "a b"), (9, "z z")]
    _write_documents(spark, tmp_path, rows)
    row = q_unigram_drift(spark, str(tmp_path)).collect()[0]
    assert row["n_new_docs"] == 3
    # avg of (1.087463, 1.087463, 4.087463) = 2.087463 -> round4
    assert row["avg_cross_entropy_bits"] == 2.0875
    # 2^2.087463 = 4.25 (to 2dp)
    assert row["perplexity"] == 4.25


def test_unigram_drift_identical_slices_low_entropy(spark, tmp_path):
    rows = [(i, "a b c d") for i in range(10)]
    _write_documents(spark, tmp_path, rows)
    row = q_unigram_drift(spark, str(tmp_path)).collect()[0]
    # uniform seen vocab: every token costs log2(33/8) ~ 2.044 bits
    assert row["avg_cross_entropy_bits"] < 2.1


# --------------------------------------------------------- graph_degree_stats


def test_graph_degree_stats_clique_degrees(spark, tmp_path):
    text = "engine torque manifold sensor coolant piston valve gasket throttle"
    _write_documents(
        spark,
        tmp_path,
        [
            (0, text),
            (1, text),
            (2, text),
            (3, "completely different vocabulary nothing shared here now"),
        ],
    )
    out = {r["doc_id"]: r for r in q_graph_degree_stats(spark, str(tmp_path)).collect()}
    # 3-clique: every member has degree 2; isolated doc 3 absent
    assert set(out) == {0, 1, 2}
    assert all(out[d]["degree"] == 2 for d in (0, 1, 2))
    assert [out[d]["degree_rank"] for d in (0, 1, 2)] == [1, 2, 3]


# ------------------------------------------------------------ cohort_retention


def test_cohort_retention_matrix_by_hand(spark, tmp_path):
    from pdf_extractor_spark.queries import q_cohort_retention

    rows = [
        # u1: first day 01-01, active 01-01/02/03
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-02 10:00:00", 1, "view", 0.0),
        (3, "2024-01-03 10:00:00", 1, "view", 0.0),
        # u2: day-0 only
        (10, "2024-01-01 11:00:00", 2, "view", 0.0),
        (11, "2024-01-01 12:00:00", 2, "click", 0.0),  # same day, 1 active
        # u3: cohort 01-02, returns on 01-04
        (20, "2024-01-02 09:00:00", 3, "view", 0.0),
        (21, "2024-01-04 09:00:00", 3, "view", 0.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        (r["cohort_day"], r["day_offset"]): (r["n_active"], r["retention"])
        for r in q_cohort_retention(spark, str(tmp_path)).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-01", 2)] == (1, 0.5)
    assert out[("2024-01-02", 0)] == (1, 1.0)
    assert out[("2024-01-02", 2)] == (1, 1.0)
    assert len(out) == 5  # no fabricated offsets


# ---------------------------------------------------------------- token_gini


def test_token_gini_flat_and_concentrated(spark, tmp_path):
    from pdf_extractor_spark.queries import q_token_gini

    _write_documents(spark, tmp_path, [(0, "a b"), (1, "c d"), (2, "e f")])
    row = q_token_gini(spark, str(tmp_path)).collect()[0]
    assert (row["n_docs"], row["total_tokens"], row["gini"]) == (3, 6, 0.0)

    _write_documents(spark, tmp_path, [(0, ""), (1, ""), (2, "a b c d e f")])
    row = q_token_gini(spark, str(tmp_path)).collect()[0]
    # maximal concentration at n=3: (n-1)/n = 0.6667
    assert (row["total_tokens"], row["gini"]) == (6, 0.6667)
