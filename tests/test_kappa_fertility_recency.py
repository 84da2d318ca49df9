"""Measurement + mixing ops on crafted inputs: Cohen's kappa from a
hand-built 2x2 contingency (including the zero-agreement-above-chance
case), tokenizer fertility with exact UTF-8 byte math and the tokenless
NULL guard, and half-life recency weights at analytically known ages."""

from __future__ import annotations

import math

import pandas as pd
import pytest


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "crafted"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


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


# ------------------------------------------------------------ heuristic_kappa


def test_kappa_zero_when_agreement_equals_chance(spark, tmp_path):
    from pdf_extractor_spark.queries import q_heuristic_kappa

    _write_documents(
        spark,
        tmp_path,
        [
            (0, "the of and to in is", "en"),     # tp: stopword-dense
            (1, "zebra quux blorp gnar", "en"),   # fn: no stopwords
            (2, "zug bahn hof gleis", "de"),      # tn
            (3, "the the the the", "de"),         # fp
        ],
    )
    r = q_heuristic_kappa(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["tp"], r["fp"], r["fn"], r["tn"]) == (4, 1, 1, 1, 1)
    assert (r["po"], r["pe"], r["kappa"]) == (0.5, 0.5, 0.0)


def test_kappa_one_on_perfect_agreement(spark, tmp_path):
    from pdf_extractor_spark.queries import q_heuristic_kappa

    _write_documents(
        spark,
        tmp_path,
        [
            (0, "the of and to", "en"),
            (1, "zug bahn hof", "de"),
        ],
    )
    r = q_heuristic_kappa(spark, str(tmp_path)).collect()[0]
    assert (r["tp"], r["tn"], r["fp"], r["fn"]) == (1, 1, 0, 0)
    assert (r["po"], r["kappa"]) == (1.0, 1.0)


# -------------------------------------------------------- tokenizer_fertility


def test_fertility_bytes_vs_chars_and_null_guard(spark, tmp_path):
    from pdf_extractor_spark.queries import q_tokenizer_fertility

    _write_documents(
        spark,
        tmp_path,
        [
            (0, "ab cd", "en"),   # 2 pieces, 5 bytes, 5 chars
            (1, "héé", "fr"),  # pieces h, é, é; 5 bytes, 3 chars
            (2, "", "zz"),        # tokenless: NULL fertility, not a crash
        ],
    )
    out = {r["lang"]: r for r in q_tokenizer_fertility(spark, str(tmp_path)).collect()}
    en = out["en"]
    assert (en["total_pieces"], en["bytes_per_piece"], en["chars_per_piece"]) == (
        2, 2.5, 2.5,
    )
    fr = out["fr"]
    assert fr["total_pieces"] == 3
    assert fr["bytes_per_piece"] == round(5 / 3, 4)  # multi-byte é counted
    assert fr["chars_per_piece"] == 1.0
    zz = out["zz"]
    assert zz["total_pieces"] == 0
    assert zz["bytes_per_piece"] is None and zz["chars_per_piece"] is None


# ----------------------------------------------------------- recency_weights


def test_recency_halflife_and_type_normalization(spark, tmp_path):
    from pdf_extractor_spark.queries import q_recency_weights

    _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-15 00:00:00", 1, "view", 0.0),   # anchor (newest)
            (2, "2024-01-08 00:00:00", 1, "view", 0.0),   # 7 days: half
            (3, "2024-01-01 00:00:00", 2, "click", 0.0),  # own type: norm 1
        ],
    )
    out = {r["event_id"]: r for r in q_recency_weights(spark, str(tmp_path)).collect()}
    assert out[1]["age_days"] == 0.0 and out[1]["weight"] == 1.0
    assert out[2]["age_days"] == 7.0
    assert out[2]["weight"] == pytest.approx(0.5, abs=1e-6)
    half = math.exp(-math.log(2))  # the exact double the engines compute
    assert out[1]["norm_weight"] == pytest.approx(1 / (1 + half), abs=1e-8)
    assert out[2]["norm_weight"] == pytest.approx(half / (1 + half), abs=1e-8)
    # click is alone in its type: full normalized mass regardless of age
    assert out[3]["age_days"] == 14.0
    assert out[3]["norm_weight"] == 1.0
