"""JSONL/CSV transcript sources: canonical-schema normalization, corrupt
capture, and — the real contract — pipeline output equality: the same
conversations must chunk identically regardless of arrival format."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.operators.chunk import chunk_conversations
from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.sources.formats import (
    read_transcripts_csv,
    read_transcripts_jsonl,
    write_transcripts_csv,
    write_transcripts_jsonl,
)
from pdf_extractor_spark.sources.transcripts import (
    TRANSCRIPT_DDL,
    generate_rows,
    rows_to_pandas,
)


@pytest.fixture(scope="module")
def canonical(spark):
    return spark.createDataFrame(
        rows_to_pandas(generate_rows(4, seed=42)), TRANSCRIPT_DDL
    )


def _chunks(df):
    return (
        chunk_conversations(extract_turns(df, with_first_extract=True))
        .orderBy("conv_id", "chunk_index")
        .toPandas()
        .reset_index(drop=True)
    )


def test_jsonl_round_trip_chunks_identically(spark, tmp_path, canonical):
    p = str(tmp_path / "t.jsonl")
    write_transcripts_jsonl(canonical, p)
    clean, corrupt = read_transcripts_jsonl(spark, p)
    assert corrupt.count() == 0
    assert clean.schema == canonical.schema
    pd.testing.assert_frame_equal(_chunks(canonical), _chunks(clean))


def test_csv_round_trip_chunks_identically(spark, tmp_path, canonical):
    p = str(tmp_path / "t.csv")
    write_transcripts_csv(canonical, p)
    clean, corrupt = read_transcripts_csv(spark, p)
    assert corrupt.count() == 0
    assert clean.schema == canonical.schema
    pd.testing.assert_frame_equal(_chunks(canonical), _chunks(clean))


def test_jsonl_corrupt_lines_are_captured_not_dropped(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"conv_id":"c0","turn_idx":0,"role":"user","text":"hi","tool":null,'
        '"ts":"2026-01-01T00:00:00.000Z"}\n'
        "this is not json at all\n"
        '{"conv_id":"c0","turn_idx":"NOT_AN_INT","role":"user","text":"x",'
        '"tool":null,"ts":"2026-01-01T00:00:01.000Z"}\n'
    )
    clean, corrupt = read_transcripts_jsonl(spark, str(p))
    assert clean.count() == 1
    assert corrupt.count() == 2  # garbage line + type-mismatched row
    assert clean.first()["conv_id"] == "c0"


def test_arrival_batch_release_unpersists_parse_cache(spark, tmp_path, canonical):
    """Each ingest persists exactly one parse pass; release() must drop it
    so long-lived drivers ingesting many dumps don't leak storage."""
    p = str(tmp_path / "rel.jsonl")
    write_transcripts_jsonl(canonical, p)
    batch = read_transcripts_jsonl(spark, p)
    clean, corrupt = batch  # tuple-unpacking API unchanged
    assert clean.count() > 0 and corrupt.count() == 0
    assert batch._raw.storageLevel.useMemory  # cached while consuming
    batch.release()
    assert not batch._raw.storageLevel.useMemory
    # release is end-of-life: the corrupt-capture plan needs the cache
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so re-running a branch whose
    # scan prunes to only _corrupt now refuses loudly instead of silently
    # re-parsing
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.captured.AnalysisException):
        clean.count()


def test_orc_round_trip_exact(spark, tmp_path, canonical):
    from pdf_extractor_spark.sources.formats import (
        read_transcripts_orc,
        write_transcripts_orc,
    )

    p = str(tmp_path / "t.orc")
    write_transcripts_orc(canonical, p)
    back = read_transcripts_orc(spark, p)
    assert back.schema == canonical.schema
    pd.testing.assert_frame_equal(_chunks(canonical), _chunks(back))


def test_orc_casts_and_prunes_warehouse_columns(spark, tmp_path, canonical):
    """A Hive-ish export: bigint turn_idx + an extra partition column —
    the reader narrows to the canonical types and drops the extras."""
    import pyspark.sql.functions as F
    from pdf_extractor_spark.sources.formats import read_transcripts_orc

    p = str(tmp_path / "wide.orc")
    canonical.withColumn(
        "turn_idx", F.col("turn_idx").cast("bigint")
    ).withColumn("dt", F.lit("2024-01-01")).write.orc(p)
    back = read_transcripts_orc(spark, p)
    assert back.schema == canonical.schema
    assert "dt" not in back.columns


def test_orc_missing_column_raises_not_nullfills(spark, tmp_path, canonical):
    from pdf_extractor_spark.sources.formats import read_transcripts_orc

    p = str(tmp_path / "broken.orc")
    canonical.drop("role").write.orc(p)
    with pytest.raises(ValueError, match="missing canonical columns.*role"):
        read_transcripts_orc(spark, p)
