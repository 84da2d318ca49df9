"""functions/native.py (Column API, codegen path) must agree with the SQL
expressions the driver catalog uses for the same transforms — one QA
surface, two spellings."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.functions.native import (
    is_header_shape,
    md5_int,
    normalize_ws,
    sentence_marks,
    tokens,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_normalize_ws_matches_sql_catalog(spark, docs):
    from pdf_extractor_spark.queries import q_normalize_native

    got = docs.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(normalize_ws("text")).alias("norm_len"),
    )
    want = q_normalize_native(spark, SF_DIR)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_sentence_marks_matches_sql_catalog(spark, docs):
    from pdf_extractor_spark.queries import q_sentence_stats

    got = docs.select("doc_id", sentence_marks("text").alias("sentence_marks"))
    want = q_sentence_stats(spark, SF_DIR).select("doc_id", "sentence_marks")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_header_shape_and_tokens_sane(docs):
    row = docs.select(
        F.sum(is_header_shape("text").cast("int")).alias("n_headers"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
        F.count("*").alias("n"),
    ).first()
    assert 0 <= row["n_headers"] <= row["n"]
    assert row["n_tokens"] > row["n"]  # real documents have many tokens


def test_md5_int_matches_sql_fragment(spark, docs):
    from pdf_extractor_spark.queries import _SPARK_MD5INT

    docs.createOrReplaceTempView("documents")
    got = docs.select("doc_id", md5_int("text").alias("h"))
    want = spark.sql(
        f"SELECT doc_id, {_SPARK_MD5INT.format(x='text')} AS h FROM documents"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_native_path_stays_in_codegen(docs):
    """The QA expressions must not leave whole-stage codegen (no Python
    UDF, no BatchEvalPython in the plan)."""
    plan = (
        docs.select(normalize_ws("text"), sentence_marks("text"), md5_int("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
