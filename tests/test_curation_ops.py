"""Curation-batch operators on crafted inputs: incremental LSH verdicts
(exact-copy arrival, novel arrival, tokenless arrival), graded n-gram
contamination fractions verified by hand, quantile-sketch bin math and
interpolation against hand-computed HDR bins, and skew-report shares /
heavy flags.  Engine-vs-oracle parity is covered by the contract gate;
these pin the SEMANTICS."""

from __future__ import annotations

import pandas as pd

from pdf_extractor_spark.queries import (
    q_lsh_incremental,
    q_ngram_contamination,
    q_quantile_sketch,
    q_skew_report,
)

_EVENT_DDL = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


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


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type)."""
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    pdf["value"] = 0.0
    pdf["props"] = "{}"
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        _EVENT_DDL,
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------ lsh_incremental


def test_lsh_incremental_verdicts(spark, tmp_path):
    # max doc_id 9 -> cutoff floor(9*0.8)=7 -> arrivals {7, 8, 9}
    corpus_words = [
        "engine torque manifold sensor coolant piston valve gasket",
        "throttle spark ignition filter bracket assembly harness relay",
        "module chassis bearing seal clutch differential axle rotor",
        "caliper spindle linkage damper spring bolt procedure one",
        "inspection removal installation adjustment specification two",
        "warning caution system pressure temperature voltage three",
        "resistance circuit connector terminal diagram section four",
    ]
    rows = [(i, t) for i, t in enumerate(corpus_words)]
    rows.append((7, "completely fresh vocabulary nothing shared here today"))
    rows.append((8, corpus_words[2]))  # byte-exact copy of corpus doc 2
    rows.append((9, ""))  # tokenless: no shingles, no bands
    _write_documents(spark, tmp_path, rows)

    out = {r["doc_id"]: r for r in q_lsh_incremental(spark, str(tmp_path)).collect()}
    assert set(out) == {7, 8, 9}
    assert out[8]["verdict"] == "near_dup_candidate"
    assert out[8]["nearest_corpus_doc"] == 2
    assert out[8]["n_corpus_candidates"] == 1
    assert out[7]["verdict"] == "novel"
    assert (out[7]["n_corpus_candidates"], out[7]["nearest_corpus_doc"]) == (0, None)
    assert out[9]["verdict"] == "novel"  # tokenless arrivals still get a row


# -------------------------------------------------------- ngram_contamination


def test_ngram_contamination_fractions_by_hand(spark, tmp_path):
    # doc 0 is the benchmark (doc_id % 97 == 0): shingles {a b c, b c d, c d e}
    _write_documents(
        spark,
        tmp_path,
        [
            (0, "a b c d e"),
            (1, "a b c d e"),  # exact copy: 3/3 overlap
            (2, "p q r s"),  # disjoint: 0/2
            (3, "a b c x y z"),  # {a b c, b c x, c x y, x y z}: 1/4 = 0.25
        ],
    )
    out = {r["doc_id"]: r for r in q_ngram_contamination(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}  # bench doc itself excluded
    assert (out[1]["n_grams"], out[1]["n_overlap"], out[1]["overlap_frac"]) == (3, 3, 1.0)
    assert out[1]["contaminated"] is True
    assert (out[2]["n_grams"], out[2]["n_overlap"], out[2]["contaminated"]) == (2, 0, False)
    assert (out[3]["n_grams"], out[3]["n_overlap"], out[3]["overlap_frac"]) == (4, 1, 0.25)
    assert out[3]["contaminated"] is True  # 5*1 >= 4, the 20% cut


def test_ngram_contamination_counts_distinct_grams_once(spark, tmp_path):
    # repeated shingle inside one doc must count once in both numerator
    # and denominator (array_distinct before explode)
    _write_documents(
        spark,
        tmp_path,
        [(0, "a b c d"), (1, "a b c a b c a b c")],
    )
    out = {r["doc_id"]: r for r in q_ngram_contamination(spark, str(tmp_path)).collect()}
    # doc 1 grams: {a b c, b c a, c a b} -> only 'a b c' is in bench
    assert (out[1]["n_grams"], out[1]["n_overlap"]) == (3, 1)


# ------------------------------------------------------------ quantile_sketch


def test_quantile_sketch_hand_computed_bins(spark, tmp_path):
    # n_chars = len(text); craft exact lengths 4,4,4,5,6,7,8,16
    lengths = [4, 4, 4, 5, 6, 7, 8, 16]
    _write_documents(
        spark, tmp_path, [(i, "x" * n) for i, n in enumerate(lengths)]
    )
    out = {r["q"]: r for r in q_quantile_sketch(spark, str(tmp_path)).collect()}
    assert set(out) == {0.5, 0.9, 0.99}
    # p50: target 4.0 -> bin (k=2,sub=1)=[5,6): cume_prev 3 -> 5 + 1/1*1
    p50 = out[0.5]
    assert (p50["bin_lo"], p50["bin_hi"], p50["estimate"]) == (5.0, 6.0, 6.0)
    # p90: target 7.2 -> bin (k=4,sub=0)=[16,20): 16 + 0.2/1*4 = 16.8
    p90 = out[0.9]
    assert (p90["bin_lo"], p90["bin_hi"], p90["estimate"]) == (16.0, 20.0, 16.8)
    # p99: target 7.92 -> same bin: 16 + 0.92/1*4 = 19.68
    assert out[0.99]["estimate"] == 19.68
    assert all(r["n_values"] == 8 for r in out.values())


def test_quantile_sketch_relative_error_bound_on_real_data(spark):
    # log-linear bins with 4 sub-bins per octave: every estimate within
    # 25% of the EXACT percentile (the sketch's design guarantee)
    sf = "/root/testdata/sf0.001"
    out = {r["q"]: r["estimate"] for r in q_quantile_sketch(spark, sf).collect()}
    exact = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .selectExpr(
            "percentile(n_chars, 0.5) p50",
            "percentile(n_chars, 0.9) p90",
            "percentile(n_chars, 0.99) p99",
        )
        .collect()[0]
    )
    for q, ex in ((0.5, exact["p50"]), (0.9, exact["p90"]), (0.99, exact["p99"])):
        assert abs(out[q] - ex) / ex <= 0.25, (q, out[q], ex)


# ---------------------------------------------------------------- skew_report


def test_skew_report_shares_cume_and_heavy_flag(spark, tmp_path):
    rows, eid = [], 0
    for user, n in ((1, 50), (2, 30), (3, 19), (4, 1)):
        for i in range(n):
            rows.append((eid, f"2024-01-01 10:{i % 60:02d}:{eid % 60:02d}", user, "view"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in q_skew_report(spark, str(tmp_path)).collect()}
    assert [out[u]["rnk"] for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[1]["share"] == 0.5 and out[1]["cume_share"] == 0.5
    assert out[2]["cume_share"] == 0.8
    assert out[3]["cume_share"] == 0.99
    assert out[4]["cume_share"] == 1.0
    # heavy = share >= 2% (integer compare): user 4 has exactly 1% -> False
    assert [out[u]["is_heavy"] for u in (1, 2, 3, 4)] == [True, True, True, False]
