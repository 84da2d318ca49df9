"""Semantic decontamination, bucket-ECDF percentile normalization,
vocabulary coverage curve, Welch t-test — crafted-input semantics tests.
Parity is covered by the contract gate."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    q_decontaminate_semantic,
    q_quality_percentile_norm,
    q_source_length_ttest,
    q_vocab_coverage_curve,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_documents_sources(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, pairs):
    """pairs: (vec_id, [floats])."""
    rows = [(i, [float(x) for x in v], 0) for i, v in pairs]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


# ----------------------------------------------------- decontaminate_semantic


def test_decontaminate_semantic_flags_paraphrase_axis(spark, tmp_path):
    _write_embeddings(
        spark, tmp_path,
        [
            (0, [1.0, 0.0]),          # bench
            (1, [0.0, 1.0]),          # bench
            (10, [1.0, 0.0]),         # exact copy of bench 0 -> cos 1.0
            (11, [0.6, 0.8]),         # cos 0.6 to bench0, 0.8 to bench1
            (12, [0.99, 0.141067]),   # cos ~0.99 to bench 0
        ],
    )
    out = (
        q_decontaminate_semantic(spark, str(tmp_path))
        .toPandas()
        .set_index("vec_id")
    )
    assert bool(out.loc[10, "contaminated"]) and out.loc[10, "max_cos"] == 1.0
    assert out.loc[10, "nearest_bench_id"] == 0
    assert not bool(out.loc[11, "contaminated"])
    assert out.loc[11, "nearest_bench_id"] == 1  # 0.8 beats 0.6
    assert bool(out.loc[12, "contaminated"])


def test_decontaminate_semantic_tie_breaks_lowest_bench_id(spark, tmp_path):
    # equidistant from both bench vectors: nearest must be bench 0
    _write_embeddings(
        spark, tmp_path,
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (10, [1.0, 1.0])],
    )
    out = q_decontaminate_semantic(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["nearest_bench_id"] == 0
    assert out["max_cos"] == pytest.approx(round(1 / math.sqrt(2), 4))


# --------------------------------------------------- quality_percentile_norm


def test_quality_percentile_norm_matches_pandas_percent_rank(spark):
    out = q_quality_percentile_norm(spark, SF_DIR).toPandas()
    n = len(out)
    assert n > 0
    # exact percent_rank semantics: (count strictly smaller) / (n-1)
    smaller = out["score"].rank(method="min") - 1
    expect_glob = (smaller / (n - 1)).round(4)
    pd.testing.assert_series_equal(
        out["pct_global"], expect_glob, check_names=False
    )
    # within one source too
    src = out[out.source == out.source.iloc[0]]
    m = len(src)
    if m > 1:
        s_smaller = src["score"].rank(method="min") - 1
        pd.testing.assert_series_equal(
            src["pct_in_source"], (s_smaller / (m - 1)).round(4),
            check_names=False,
        )
    # gap column is the difference of the two (round-trip of rounds)
    assert (
        (out["pct_gap"] - (out["pct_in_source"] - out["pct_global"])).abs()
        < 2e-4
    ).all()


def test_quality_percentile_norm_single_doc_source_is_zero(spark, tmp_path):
    _write_documents_sources(
        spark, tmp_path,
        [(0, "alpha beta gamma", "en", "solo"),
         (1, "delta epsilon", "en", "big"),
         (2, "zeta eta theta iota", "en", "big")],
    )
    out = (
        q_quality_percentile_norm(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "pct_in_source"] == 0.0  # n_src=1 guard


# ------------------------------------------------------- vocab_coverage_curve


def test_vocab_coverage_curve_hand_computed(spark, tmp_path):
    text = " ".join(["a"] * 50 + ["b"] * 40 + ["c"] * 5 + ["d"] * 3
                    + ["e"] + ["f"])
    _write_documents_sources(spark, tmp_path, [(0, text, "en", "w")])
    out = q_vocab_coverage_curve(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["vocab_size"] == 6 and out["total_occurrences"] == 100
    assert out["types_for_50pct"] == 1   # a alone covers 50
    assert out["types_for_90pct"] == 2   # a+b cover 90
    assert out["types_for_99pct"] == 5   # a..e cover 99


# -------------------------------------------------------- source_length_ttest


def test_source_length_ttest_hand_computed_welch(spark, tmp_path):
    rows = []
    for i, n in enumerate([10, 20, 30]):
        rows.append((i, "x" * n, "en", "A"))
    for i, n in enumerate([40, 50, 60]):
        rows.append((10 + i, "x" * n, "en", "B"))
    _write_documents_sources(spark, tmp_path, rows)
    out = q_source_length_ttest(spark, str(tmp_path)).toPandas().iloc[0]
    assert (out["source_a"], out["source_b"]) == ("A", "B")
    assert out["mean_a"] == 20.0 and out["mean_b"] == 50.0
    # var=100 each: t = -30 / sqrt(100/3 + 100/3)
    assert out["t_stat"] == pytest.approx(round(-30 / math.sqrt(200 / 3), 4))
    assert bool(out["significant"])


def test_source_length_ttest_identical_sources_not_significant(spark, tmp_path):
    rows = [(0, "x" * 10, "en", "A"), (1, "x" * 20, "en", "A"),
            (2, "x" * 10, "en", "B"), (3, "x" * 20, "en", "B")]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_source_length_ttest(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["t_stat"] == 0.0 and not bool(out["significant"])
