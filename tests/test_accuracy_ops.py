"""Accuracy/drift operators on crafted inputs: entropy values verified
by hand (including the exact 2.0-bit boundary), langid confusion cells,
KS drift on identical vs disjoint distributions, and minhash estimation
error on exact duplicates.  Parity is covered by the contract gate."""

from __future__ import annotations

import pandas as pd

from pdf_extractor_spark.queries import (
    q_char_entropy,
    q_ks_drift,
    q_langid_confusion,
    q_minhash_est_error,
)


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "crafted"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ---------------------------------------------------------------- char_entropy


def test_char_entropy_hand_values_and_boundary(spark, tmp_path):
    _write_documents(
        spark,
        tmp_path,
        [
            (0, "aaaa", "en"),  # one run: entropy 0
            (1, "abab", "en"),  # two equal runs: exactly 1 bit
            (2, "abcd", "en"),  # four equal runs: exactly 2 bits
            (3, "AAaa", "en"),  # lowercased first: still one run
            (4, "", "en"),  # empty: excluded
        ],
    )
    out = {r["doc_id"]: r for r in q_char_entropy(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert (out[0]["entropy_bits"], out[0]["n_distinct_chars"]) == (0.0, 1)
    assert out[0]["low_entropy"] is True
    assert out[1]["entropy_bits"] == 1.0
    # the exact boundary: 2.0 bits is NOT low (< is strict)
    assert out[2]["entropy_bits"] == 2.0 and out[2]["low_entropy"] is False
    assert (out[3]["entropy_bits"], out[3]["n_chars_used"]) == (0.0, 4)


# ------------------------------------------------------------ langid_confusion


def test_langid_confusion_cells(spark, tmp_path):
    stop_heavy = "the cat is on the mat and it is the best of all the things"
    no_stop = "torque manifold sensor coolant piston valve gasket bracket"
    _write_documents(
        spark,
        tmp_path,
        [
            (0, stop_heavy, "en"),  # en predicted en: correct
            (1, stop_heavy, "en"),
            (2, no_stop, "en"),  # en predicted other: MISS
            (3, no_stop, "de"),  # de predicted other: correct
            (4, stop_heavy, "de"),  # de predicted en: false positive
        ],
    )
    out = {
        (r["true_lang"], r["predicted_lang"]): r
        for r in q_langid_confusion(spark, str(tmp_path)).collect()
    }
    assert out[("en", "en")]["n"] == 2
    assert out[("en", "en")]["share_of_true"] == 0.6667
    assert out[("en", "en")]["is_correct"] is True
    assert out[("en", "other")]["n"] == 1
    assert out[("en", "other")]["is_correct"] is False
    assert out[("de", "other")]["is_correct"] is True
    assert out[("de", "en")]["is_correct"] is False
    assert out[("de", "en")]["share_of_true"] == 0.5


# -------------------------------------------------------------------- ks_drift


def test_ks_drift_identical_and_disjoint(spark, tmp_path):
    # ids 0..9 -> cutoff 7: old = 0..6, new = 7..9
    same = [(i, "x" * 10, "en") for i in range(10)]
    _write_documents(spark, tmp_path, same)
    row = q_ks_drift(spark, str(tmp_path)).collect()[0]
    assert (row["ks_d"], row["n_old"], row["n_new"]) == (0.0, 7, 3)
    assert row["drifted"] is False

    shifted = [(i, "x" * 10, "en") for i in range(7)] + [
        (i, "x" * 50, "en") for i in (7, 8, 9)
    ]
    _write_documents(spark, tmp_path, shifted)
    row = q_ks_drift(spark, str(tmp_path)).collect()[0]
    # disjoint supports: sup gap is 1.0 at v=10; critical value
    # 1.358*sqrt(10/21) ~ 0.937 -> drifted
    assert row["ks_d"] == 1.0 and row["drifted"] is True


# ----------------------------------------------------------- minhash_est_error


def test_minhash_est_error_exact_duplicates(spark, tmp_path):
    text = "engine torque manifold sensor coolant piston valve gasket throttle"
    _write_documents(
        spark,
        tmp_path,
        [
            (0, text, "en"),
            (1, text, "en"),  # byte-exact duplicate of 0
            (2, "completely different vocabulary nothing shared here now", "en"),
        ],
    )
    out = q_minhash_est_error(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert (r["est_jaccard"], r["exact_jaccard"], r["est_error"]) == (1.0, 1.0, 0.0)
