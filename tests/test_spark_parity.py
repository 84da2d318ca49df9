"""GOLDEN CHECKS #1 and #2 (SURVEY.md §7.1): the Spark pipeline must equal
the pure-Python oracle goldens byte-for-byte — per-turn text equality and
chunk-span equality under stable turn ordering — plus checkpoint/resume
idempotence (FIXTURES.md §4 last invariant).
"""

from __future__ import annotations

import json
import pathlib

import pytest

from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.plans.pipeline import (
    read_chunks,
    read_documents,
    read_lineage,
    run_extraction,
)
from pdf_extractor_spark.sources.transcripts import generate_rows, rows_to_pandas

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "goldens"
GOLDEN_CONVS = 20
GOLDEN_SKEW_EVERY = 20

TURN_KEY = ("conv_id", "turn_idx")
TURN_COLS = (
    "conv_id", "turn_idx", "clean_text", "printed_page", "chapter",
    "char_count", "parse_ok", "rejected_xss",
)
CHUNK_COLS = (
    "conv_id", "chunk_index", "content", "turns", "printed_pages",
    "chapters", "char_count", "start_turn", "end_turn",
)
DOC_COLS = ("conv_id", "title", "num_turns", "chunk_count", "status")


def _golden(name):
    return json.loads((GOLDEN_DIR / f"{name}.json").read_text(encoding="utf-8"))


@pytest.fixture(scope="module")
def transcripts(spark):
    # same corpus as tools/make_goldens.py, rows shuffled by generate_rows
    rows = generate_rows(GOLDEN_CONVS, 42, skew_every=GOLDEN_SKEW_EVERY)
    return spark.createDataFrame(rows_to_pandas(rows)).cache()


@pytest.fixture(scope="module")
def pipeline_output(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipeline"))
    summary = run_extraction(spark, transcripts, root, buckets=8, buckets_per_batch=4)
    return root, summary


def _rows_as_dicts(df, cols):
    return sorted(
        ([r[c] for c in cols] for r in df.select(*cols).collect()),
    )


def _golden_as_lists(rows, cols):
    return sorted([r[c] for c in cols] for r in rows)


class TestGoldenCheck1_Turns:
    def test_per_turn_text_equality(self, transcripts):
        got = _rows_as_dicts(extract_turns(transcripts), TURN_COLS)
        want = _golden_as_lists(_golden("turns"), TURN_COLS)
        assert len(got) == len(want)
        assert got == want


class TestGoldenCheck2_Chunks:
    def test_chunk_span_equality(self, spark, pipeline_output):
        root, _ = pipeline_output
        got = _rows_as_dicts(read_chunks(spark, root), CHUNK_COLS)
        want = _golden_as_lists(_golden("chunks"), CHUNK_COLS)
        assert len(got) == len(want)
        assert got == want

    def test_documents_equality(self, spark, pipeline_output):
        root, _ = pipeline_output
        got = _rows_as_dicts(read_documents(spark, root), DOC_COLS)
        want = _golden_as_lists(_golden("docs"), DOC_COLS)
        assert got == want

    def test_embeddings_present_and_deterministic(self, spark, pipeline_output):
        from pdf_extractor_spark.config import EMBED_DIM
        from pdf_extractor_spark.core.embed import embed_text

        root, _ = pipeline_output
        row = (
            read_chunks(spark, root)
            .orderBy("conv_id", "chunk_index")
            .select("content", "embedding")
            .first()
        )
        assert len(row.embedding) == EMBED_DIM
        expected = embed_text(row.content, EMBED_DIM)
        assert [round(float(x), 5) for x in row.embedding[:8]] == [
            round(float(x), 5) for x in expected[:8]
        ]


class TestLineage:
    def test_counters_match_input(self, spark, transcripts, pipeline_output):
        root, summary = pipeline_output
        totals = summary["totals"]
        assert totals["turns_in"] == transcripts.count()
        assert totals["convs"] == GOLDEN_CONVS
        assert totals["chunks_out"] == len(_golden("chunks"))
        assert totals["convs_rejected"] == sum(
            1 for d in _golden("docs") if d["status"] != "embedded"
        )
        # F3 warn-level structure flags roll up exactly-once into lineage
        assert totals["struct_warnings"] == sum(
            t["struct_warn"] for t in _golden("turns")
        )
        lineage = read_lineage(spark, root)
        assert lineage.count() == len(summary["batches"])


class TestResume:
    def test_kill_and_resume_no_duplicates(self, spark, transcripts, tmp_path):
        root = str(tmp_path / "resume")
        with pytest.raises(RuntimeError, match="simulated kill"):
            run_extraction(
                spark, transcripts, root,
                buckets=8, buckets_per_batch=2, fail_after_batches=2,
            )
        partial = len(
            __import__("pdf_extractor_spark.plans.pipeline", fromlist=["committed_batches"])
            .committed_batches(root)
        )
        assert partial == 2

        summary = run_extraction(
            spark, transcripts, root, buckets=8, buckets_per_batch=2
        )
        assert summary["executed_now"] == 2  # only the missing batches ran

        got = _rows_as_dicts(read_chunks(spark, root), CHUNK_COLS)
        want = _golden_as_lists(_golden("chunks"), CHUNK_COLS)
        assert got == want  # byte-identical, no dups, nothing missing

        # a third run is a no-op
        summary2 = run_extraction(
            spark, transcripts, root, buckets=8, buckets_per_batch=2
        )
        assert summary2["executed_now"] == 0

    def test_disjoint_bucket_ranges_compose(self, spark, transcripts, tmp_path):
        """Multi-executor work split: two runs over disjoint bucket ranges
        commit into the SAME root (bucket-derived batch ids never collide)
        and together equal one whole-range run byte-for-byte."""
        root = str(tmp_path / "mexec")
        s1 = run_extraction(
            spark, transcripts, root,
            buckets=8, buckets_per_batch=2, bucket_range=(0, 4),
        )
        s2 = run_extraction(
            spark, transcripts, root,
            buckets=8, buckets_per_batch=2, bucket_range=(4, 8),
        )
        assert s1["executed_now"] == 2 and s2["executed_now"] == 2

        got = _rows_as_dicts(read_chunks(spark, root), CHUNK_COLS)
        want = _golden_as_lists(_golden("chunks"), CHUNK_COLS)
        assert got == want

        # a whole-range pass over the same root finds everything committed
        s3 = run_extraction(spark, transcripts, root, buckets=8, buckets_per_batch=2)
        assert s3["executed_now"] == 0


class TestTitlePrecedence:
    """api.py:1314-1319 parity: metadata title wins over inference when a
    caller provides the optional meta_title column; absent or blank
    metadata falls back to first-turn inference."""

    def test_meta_title_wins_and_null_falls_back(self, spark):
        from pyspark.sql import functions as F

        from pdf_extractor_spark.operators.chunk import (
            SENTINEL_INDEX,
            chunk_conversations,
        )

        rows = generate_rows(2, seed=42)
        extracted = extract_turns(
            spark.createDataFrame(rows_to_pandas(rows)), with_first_extract=True
        ).withColumn(
            "meta_title",
            F.when(F.col("conv_id") == "conv-000000", F.lit("Official Manual Title")),
        )
        sentinels = {
            r["conv_id"]: r["title"]
            for r in chunk_conversations(extracted)
            .where(F.col("chunk_index") == SENTINEL_INDEX)
            .collect()
        }
        assert sentinels["conv-000000"] == "Official Manual Title"
        golden_titles = {d["conv_id"]: d["title"] for d in _golden("docs")}
        assert sentinels["conv-000001"] == golden_titles["conv-000001"]


class TestPackedEmbeddings:
    """Schema-v2 packed embeddings: binary cells carry the identical
    float32 stream as the v1 array column, and the unpack adapter
    round-trips exactly."""

    def test_packed_roundtrip_equals_array(self, spark, tmp_path):
        import numpy as np
        from pyspark.sql import functions as F

        from pdf_extractor_spark.config import EMBED_DIM
        from pdf_extractor_spark.operators.enrich import unpack_embeddings
        from pdf_extractor_spark.plans.pipeline import build_multiplexed

        rows = generate_rows(3, seed=21)
        tx = spark.createDataFrame(rows_to_pandas(rows))

        out_v2 = str(tmp_path / "v2")
        build_multiplexed(tx, packed_embeddings=True).write.parquet(out_v2)
        packed = spark.read.parquet(out_v2).where(F.col("chunk_index") != -1)

        row = packed.select("content", "embedding").orderBy("content").first()
        assert isinstance(row.embedding, (bytes, bytearray))
        assert len(row.embedding) == 4 * EMBED_DIM

        from pdf_extractor_spark.core.embed import embed_text

        np.testing.assert_array_equal(
            np.frombuffer(row.embedding, dtype="<f4"), embed_text(row.content)
        )

        unpacked = unpack_embeddings(packed).select("content", "embedding")
        r2 = unpacked.orderBy("content").first()
        np.testing.assert_array_equal(
            np.asarray(r2.embedding, dtype=np.float32), embed_text(r2.content)
        )
