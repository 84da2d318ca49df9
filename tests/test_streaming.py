"""Streaming ingest: availableNow drain equals the batch pipeline output,
checkpointed restart ingests nothing new, watermark aggregation plan is
valid on a stream.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.operators.chunk import SENTINEL_INDEX
from pdf_extractor_spark.sources.transcripts import (
    TRANSCRIPT_DDL,
    generate_rows,
    rows_to_pandas,
)
from pdf_extractor_spark.streaming.ingest import (
    run_stream,
    stream_transcripts,
    windowed_turn_rates,
)

N_CONVS = 12


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ckpt = str(root / "in"), str(root / "out"), str(root / "ckpt")
    pdf = rows_to_pandas(generate_rows(N_CONVS, seed=42))
    spark.createDataFrame(pdf, TRANSCRIPT_DDL).repartition(3).write.parquet(in_dir)
    return in_dir, out_dir, ckpt


def test_stream_drain_matches_batch(spark, stream_dirs):
    in_dir, out_dir, ckpt = stream_dirs
    q = run_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    from pdf_extractor_spark.operators.chunk import chunk_conversations
    from pdf_extractor_spark.operators.enrich import add_embeddings
    from pdf_extractor_spark.operators.extract import extract_turns

    want = add_embeddings(
        chunk_conversations(
            extract_turns(spark.read.parquet(in_dir), with_first_extract=True)
        )
    )
    g = got.orderBy("conv_id", "chunk_index").toPandas()
    w = want.orderBy("conv_id", "chunk_index").toPandas()
    pd.testing.assert_frame_equal(
        g.reset_index(drop=True), w.reset_index(drop=True)
    )
    assert (g["chunk_index"] == SENTINEL_INDEX).sum() == N_CONVS


def test_stream_restart_is_noop(spark, stream_dirs):
    in_dir, out_dir, ckpt = stream_dirs
    before = spark.read.parquet(out_dir).count()
    q = run_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == before


def test_windowed_rates_plan_on_stream(spark, stream_dirs):
    in_dir, *_ = stream_dirs
    agg = windowed_turn_rates(stream_transcripts(spark, in_dir))
    assert agg.isStreaming
    assert {f.name for f in agg.schema.fields} == {
        "start", "end", "role", "n_turns", "chars_in",
    }


def test_multi_microbatch_drain_same_output(spark, tmp_path):
    """maxFilesPerTrigger=1 forces several micro-batches; the union of all
    batch appends must equal the single-batch drain (conversations are
    file-aligned, honoring the whole-conversation-per-batch contract)."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    # write each conversation as its own parquet file
    pdf = rows_to_pandas(generate_rows(6, seed=7))
    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)
    df.repartition(6, "conv_id").write.parquet(in_dir)

    q = run_stream(
        spark, in_dir, out_dir, ckpt, available_now=True,
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) >= 3  # really several micro-batches

    got = spark.read.parquet(out_dir)
    n_sentinels = got.where(got.chunk_index == SENTINEL_INDEX).count()
    assert n_sentinels == 6
    assert got.select("conv_id").distinct().count() == 6
