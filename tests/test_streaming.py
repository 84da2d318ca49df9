"""Streaming ingest: availableNow drain equals the batch pipeline output,
checkpointed restart ingests nothing new, per-batch writes are idempotent
under foreachBatch replay, cross-batch conversations are quarantined (never
silently mis-chunked), watermark aggregation plan is valid on a stream.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest

from pdf_extractor_spark.operators.chunk import SENTINEL_INDEX
from pdf_extractor_spark.sources.transcripts import (
    TRANSCRIPT_DDL,
    generate_rows,
    rows_to_pandas,
)
from pdf_extractor_spark.streaming.ingest import (
    process_micro_batch,
    quarantined_convs,
    read_quarantine,
    read_stream_output,
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

    got = read_stream_output(spark, out_dir)
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
    assert quarantined_convs(spark, out_dir) == 0


def test_stream_restart_is_noop(spark, stream_dirs):
    in_dir, out_dir, ckpt = stream_dirs
    before = read_stream_output(spark, out_dir).count()
    q = run_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    assert read_stream_output(spark, out_dir).count() == before


def test_windowed_rates_plan_on_stream(spark, stream_dirs):
    in_dir, *_ = stream_dirs
    agg = windowed_turn_rates(stream_transcripts(spark, in_dir))
    assert agg.isStreaming
    assert {f.name for f in agg.schema.fields} == {
        "start", "end", "role", "n_turns", "chars_in",
    }


def test_multi_microbatch_drain_same_output(spark, tmp_path):
    """maxFilesPerTrigger forces several micro-batches; the union of all
    batch partitions must equal the single-batch drain (conversations are
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

    got = read_stream_output(spark, out_dir)
    n_sentinels = got.where(got.chunk_index == SENTINEL_INDEX).count()
    assert n_sentinels == 6
    assert got.select("conv_id").distinct().count() == 6
    assert quarantined_convs(spark, out_dir) == 0


def _extracted(spark, pdf):
    from pdf_extractor_spark.operators.extract import extract_turns

    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)
    return extract_turns(df, with_first_extract=True)


def test_process_micro_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the same (batch_df,
    batch_id) after a simulated crash must reproduce identical output,
    not a duplicate copy."""
    out_dir = str(tmp_path / "out")
    pdf = rows_to_pandas(generate_rows(3, seed=11))
    batch = _extracted(spark, pdf)

    process_micro_batch(batch, 0, out_dir)
    first = read_stream_output(spark, out_dir).orderBy("conv_id", "chunk_index").toPandas()
    process_micro_batch(batch, 0, out_dir)  # replay
    second = read_stream_output(spark, out_dir).orderBy("conv_id", "chunk_index").toPandas()

    pd.testing.assert_frame_equal(
        first.reset_index(drop=True), second.reset_index(drop=True)
    )
    assert quarantined_convs(spark, out_dir) == 0  # replay never self-quarantines


def test_cross_batch_conversation_is_quarantined(spark, tmp_path):
    """A conversation whose turns straddle two micro-batches violates the
    whole-conversation-per-batch contract: its later rows must land in
    quarantine (explicit, counted) — never be silently chunked as if they
    were a fresh conversation."""
    out_dir = str(tmp_path / "out")
    rows = generate_rows(2, seed=13)  # conv-000000, conv-000001 complete
    conv0 = [r for r in rows if r[0] == "conv-000000"]
    conv1 = [r for r in rows if r[0] == "conv-000001"]
    split = len(conv0) // 2

    batch0 = _extracted(spark, rows_to_pandas(conv0[:split] + conv1))
    batch1 = _extracted(spark, rows_to_pandas(conv0[split:]))

    process_micro_batch(batch0, 0, out_dir)
    process_micro_batch(batch1, 1, out_dir)

    assert quarantined_convs(spark, out_dir) == 1
    quar = read_quarantine(spark, out_dir)
    assert {r["conv_id"] for r in quar.select("conv_id").distinct().collect()} == {
        "conv-000000"
    }
    assert quar.count() == len(conv0) - split

    # the main output contains chunks only from batch-0's view of conv0
    # (flagged suspect by the quarantine record) and all of conv1
    got = read_stream_output(spark, out_dir)
    assert got.where(got.chunk_index == SENTINEL_INDEX).count() == 2

    # replaying the violating batch must not double-quarantine
    process_micro_batch(batch1, 1, out_dir)
    assert quarantined_convs(spark, out_dir) == 1
    assert read_quarantine(spark, out_dir).count() == len(conv0) - split


def test_stream_end_to_end_quarantine(spark, tmp_path):
    """Same contract violation driven through the real stream: one
    conversation split across two input files, one file per trigger."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    rows = generate_rows(2, seed=13)
    conv0 = [r for r in rows if r[0] == "conv-000000"]
    conv1 = [r for r in rows if r[0] == "conv-000001"]
    split = len(conv0) // 2

    df1 = spark.createDataFrame(rows_to_pandas(conv0[:split] + conv1), TRANSCRIPT_DDL)
    df1.coalesce(1).write.mode("append").parquet(in_dir)
    time.sleep(1.1)  # distinct mtimes → deterministic oldest-first ordering
    df2 = spark.createDataFrame(rows_to_pandas(conv0[split:]), TRANSCRIPT_DDL)
    df2.coalesce(1).write.mode("append").parquet(in_dir)

    q = run_stream(
        spark, in_dir, out_dir, ckpt, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    assert quarantined_convs(spark, out_dir) == 1
    assert read_stream_output(spark, out_dir).where(
        "chunk_index = %d" % SENTINEL_INDEX
    ).count() == 2


def test_stateful_assembly_chunks_cross_batch_conversation(spark, tmp_path):
    """The ASSEMBLE alternative to quarantine: a conversation split across
    micro-batches buffers in group state and, once idle past the timeout,
    is chunked WHOLE — output equals the batch pipeline on the complete
    conversation, byte for byte."""
    import os

    from pdf_extractor_spark.operators.chunk import chunk_conversations
    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.streaming.stateful import run_stream_stateful

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    rows = generate_rows(2, seed=13)
    conv0 = sorted((r for r in rows if r[0] == "conv-000000"), key=lambda r: r[1])
    conv1 = sorted((r for r in rows if r[0] == "conv-000001"), key=lambda r: r[1])
    split = len(conv0) // 2

    df1 = spark.createDataFrame(rows_to_pandas(conv0[:split] + conv1), TRANSCRIPT_DDL)
    df1.coalesce(1).write.mode("append").parquet(in_dir)
    time.sleep(1.1)
    df2 = spark.createDataFrame(rows_to_pandas(conv0[split:]), TRANSCRIPT_DDL)
    df2.coalesce(1).write.mode("append").parquet(in_dir)

    q = run_stream_stateful(
        spark, in_dir, out_dir, ckpt,
        idle_timeout_ms=2000, max_files_per_trigger=1,
    )
    try:
        deadline = time.time() + 120
        got = None
        while time.time() < deadline:
            # the file sink commits its _spark_metadata log after the batch
            # write; reads race that commit, so tolerate every failure mode
            # until both sentinels are visible
            try:
                cand = spark.read.parquet(out_dir)
                if cand.where(cand.chunk_index == SENTINEL_INDEX).count() == 2:
                    got = cand
                    break
            except Exception:
                pass
            time.sleep(2)
        assert got is not None, "no output produced before deadline"
        n_sent = got.where(got.chunk_index == SENTINEL_INDEX).count()
        assert n_sent == 2, f"expected both conversations to emit, saw {n_sent}"
    finally:
        q.stop()

    want = chunk_conversations(
        extract_turns(
            spark.createDataFrame(rows_to_pandas(rows), TRANSCRIPT_DDL),
            with_first_extract=True,
        )
    )
    g = got.orderBy("conv_id", "chunk_index").toPandas()
    w = want.orderBy("conv_id", "chunk_index").toPandas()
    pd.testing.assert_frame_equal(
        g.reset_index(drop=True), w[g.columns].reset_index(drop=True)
    )


def test_stateful_assembly_state_survives_restart(spark, tmp_path):
    """Kill the stateful query after it buffered half a conversation; a
    restarted query (same checkpoint) must still assemble the WHOLE
    conversation once the second half arrives — group state lives in the
    state store, not the process."""
    from pdf_extractor_spark.operators.chunk import chunk_conversations
    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.streaming.stateful import run_stream_stateful

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    rows = generate_rows(1, seed=17)
    conv0 = sorted(rows, key=lambda r: r[1])
    split = len(conv0) // 2

    # run 1: long timeout so nothing can emit; buffer the first half
    spark.createDataFrame(rows_to_pandas(conv0[:split]), TRANSCRIPT_DDL)\
        .coalesce(1).write.mode("append").parquet(in_dir)
    q1 = run_stream_stateful(spark, in_dir, out_dir, ckpt, idle_timeout_ms=120_000)
    deadline = time.time() + 60
    while time.time() < deadline and not q1.recentProgress:
        time.sleep(1)
    assert q1.recentProgress, "first run never processed a batch"
    q1.stop()

    # run 2: same checkpoint, short timeout; second half arrives
    spark.createDataFrame(rows_to_pandas(conv0[split:]), TRANSCRIPT_DDL)\
        .coalesce(1).write.mode("append").parquet(in_dir)
    q2 = run_stream_stateful(spark, in_dir, out_dir, ckpt, idle_timeout_ms=2000)
    try:
        got = None
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                cand = spark.read.parquet(out_dir)
                if cand.where(cand.chunk_index == SENTINEL_INDEX).count() == 1:
                    got = cand
                    break
            except Exception:
                pass
            time.sleep(2)
        assert got is not None, "restarted query never emitted the conversation"
    finally:
        q2.stop()

    want = chunk_conversations(
        extract_turns(
            spark.createDataFrame(rows_to_pandas(conv0), TRANSCRIPT_DDL),
            with_first_extract=True,
        )
    )
    g = got.orderBy("chunk_index").toPandas()
    w = want.orderBy("chunk_index").toPandas()
    pd.testing.assert_frame_equal(
        g.reset_index(drop=True), w[g.columns].reset_index(drop=True)
    )


def test_run_stream_rejects_remote_output_dir(spark, tmp_path):
    """A non-local output_dir would silently disable the ledger/quarantine
    contract (driver-local listings see nothing there) — it must fail fast
    at stream start instead."""
    with pytest.raises(ValueError, match="driver-local"):
        run_stream(spark, str(tmp_path / "in"), "hdfs://nn/out", str(tmp_path / "c"))
    with pytest.raises(ValueError, match="driver-local"):
        read_quarantine(spark, "s3a://bucket/out")
    with pytest.raises(ValueError, match="driver-local"):
        quarantined_convs(spark, "abfss://c@a.dfs.core.windows.net/out")


def test_dedup_stream_drops_replayed_turns(spark, tmp_path):
    """Two files carrying the SAME rows (an at-least-once replay): the
    watermarked streaming dedup must emit each turn exactly once."""
    from pdf_extractor_spark.streaming.ingest import dedup_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf = rows_to_pandas(generate_rows(3, seed=7))
    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)
    df.coalesce(1).write.mode("append").parquet(in_dir)
    df.coalesce(1).write.mode("append").parquet(in_dir)  # exact replay
    assert spark.read.parquet(in_dir).count() == 2 * len(pdf)

    stream = stream_transcripts(spark, in_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir)
    assert out.count() == len(pdf)
    # every (conv_id, turn_idx) exactly once, schema unchanged
    assert out.groupBy("conv_id", "turn_idx").count().where("count > 1").count() == 0
    assert set(out.columns) == set(df.columns)


def test_dedup_stream_keeps_distinct_turn_content(spark, tmp_path):
    """Same key but DIFFERENT text is not a duplicate — both survive."""
    from pdf_extractor_spark.streaming.ingest import dedup_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf = rows_to_pandas(generate_rows(2, seed=7))
    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)
    df.coalesce(1).write.mode("append").parquet(in_dir)
    import pyspark.sql.functions as F
    df.withColumn("text", F.concat(F.col("text"), F.lit(" v2"))).coalesce(
        1
    ).write.mode("append").parquet(in_dir)

    q = (
        dedup_stream(stream_transcripts(spark, in_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 2 * len(pdf)


def test_dedup_stream_vs_corpus_drops_known_digests(spark, tmp_path):
    """Stream-static anti-join: turns whose text digest already exists in
    the static corpus digest table never reach the sink; fresh turns all
    survive with schema intact."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.streaming.ingest import dedup_stream_vs_corpus

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf = rows_to_pandas(generate_rows(3, seed=11))
    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)
    df.coalesce(1).write.mode("append").parquet(in_dir)

    # corpus already holds conv index 0's turns (by digest)
    known = df.where("conv_id like '%-000000'").select(
        F.md5("text").alias("turn_digest")
    )
    corpus_path = str(tmp_path / "corpus_digests")
    known.write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_known = spark.read.parquet(in_dir).join(
        corpus, F.md5("text") == F.col("turn_digest"), "left_semi"
    ).count()
    assert n_known > 0

    q = (
        dedup_stream_vs_corpus(
            stream_transcripts(spark, in_dir), corpus, broadcast=True
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir)
    assert out.count() == len(pdf) - n_known
    assert out.where("conv_id like '%-000000'").count() == 0
    assert set(out.columns) == set(df.columns)


def test_dedup_stream_vs_corpus_growing_static_side(spark, tmp_path):
    """The static side is re-planned per micro-batch: digests appended to
    the corpus BETWEEN batches filter the later batch without a stream
    restart (two availableNow runs on one checkpoint simulate the two
    trigger windows)."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.streaming.ingest import dedup_stream_vs_corpus

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus_path = str(tmp_path / "corpus_digests")
    pdf = rows_to_pandas(generate_rows(2, seed=13))
    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)

    # batch 1: empty corpus — everything passes
    spark.createDataFrame([], "turn_digest string").write.mode(
        "overwrite"
    ).parquet(corpus_path)
    df.coalesce(1).write.mode("append").parquet(in_dir)

    def run_once():
        q = (
            dedup_stream_vs_corpus(
                stream_transcripts(spark, in_dir),
                spark.read.parquet(corpus_path),
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    assert spark.read.parquet(out_dir).count() == len(pdf)

    # corpus learns every digest; the SAME rows arrive again as new files
    spark.read.parquet(in_dir).select(
        F.md5("text").alias("turn_digest")
    ).write.mode("overwrite").parquet(corpus_path)
    df.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    # nothing new lands: the replayed rows are all corpus-known now
    assert spark.read.parquet(out_dir).count() == len(pdf)


def test_observed_ingest_metrics_match_batch_counters(spark, tmp_path):
    """The observe() counters on the stream must equal the same
    aggregates computed by the batch operator over the same input — and
    they arrive for free on StreamingQueryProgress, no second scan."""
    from pdf_extractor_spark.streaming.ingest import ingest_progress_metrics

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    pdf = rows_to_pandas(generate_rows(10, seed=42))
    spark.createDataFrame(pdf, TRANSCRIPT_DDL).repartition(2).write.parquet(
        in_dir
    )
    q = run_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    got = ingest_progress_metrics(q)
    from pyspark.sql import functions as F
    from pdf_extractor_spark.operators.extract import extract_turns

    want = (
        extract_turns(spark.read.parquet(in_dir), with_first_extract=True)
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.when(F.col("parse_ok"), 0).otherwise(1)).alias(
                "parse_failures"
            ),
            F.sum(F.when(F.col("rejected_xss"), 1).otherwise(0)).alias(
                "xss_rejects"
            ),
            F.sum("bytes_in").alias("bytes_in"),
        )
        .collect()[0]
    )
    assert got["batches"] >= 1
    assert got["turns"] == want["turns"] > 0
    assert got["parse_failures"] == want["parse_failures"]
    assert got["xss_rejects"] == want["xss_rejects"]
    assert got["bytes_in"] == want["bytes_in"] > 0


def test_session_window_plan_on_stream(spark, stream_dirs):
    from pdf_extractor_spark.streaming.ingest import (
        session_windowed_conv_activity,
    )

    in_dir, *_ = stream_dirs
    agg = session_windowed_conv_activity(stream_transcripts(spark, in_dir))
    assert agg.isStreaming
    assert {f.name for f in agg.schema.fields} == {
        "conv_id", "start", "end", "n_turns", "chars_in",
    }


def test_session_window_splits_on_silence_and_flushes_on_watermark(
    spark, tmp_path
):
    """One conversation with two bursts separated by >gap of event-time
    silence must land in TWO sessions; a later file advances the
    watermark so the finalized sessions actually emit in append mode
    (the session whose burst sits nearest the stream's end stays open
    by design — the watermark-flush contract the docstring pins)."""
    from pdf_extractor_spark.streaming.ingest import (
        session_windowed_conv_activity,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2026-01-01 09:00:00")
    rows = []
    # burst 1: 3 turns a minute apart; burst 2 (2h later): 2 turns
    for i, off in enumerate([0, 60, 120, 7200, 7260]):
        rows.append(
            ("conv-A", i, "user" if i % 2 == 0 else "assistant",
             f"turn {i}", None, base + pd.Timedelta(seconds=off))
        )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    spark.createDataFrame(pdf, TRANSCRIPT_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    # watermark-advancer: a different conv a day later (its own session
    # stays open and never emits — asserted below)
    closer = pd.DataFrame(
        [("conv-Z", 0, "user", "closer", None,
          base + pd.Timedelta(days=1))],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    spark.createDataFrame(closer, TRANSCRIPT_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    q = (
        session_windowed_conv_activity(
            stream_transcripts(spark, in_dir, max_files_per_trigger=1),
            gap="30 minutes", watermark="10 minutes",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir).toPandas()
    a = out[out.conv_id == "conv-A"].sort_values("start").reset_index(
        drop=True
    )
    assert len(a) == 2, out.to_string()
    assert list(a["n_turns"]) == [3, 2]
    # session spans follow the actual bursts, not a tumbling grid
    assert a.loc[0, "start"] == base
    assert a.loc[1, "start"] == base + pd.Timedelta(seconds=7200)
    # the watermark-advancer's own session is still open: nothing emitted
    assert (out.conv_id == "conv-Z").sum() == 0


def test_error_budget_stream_sliding_windows_and_flags(spark, tmp_path):
    """Sliding 1h/15m windows: a bad-turn burst shows in EVERY window
    covering it; the burn rate and over-budget flag follow the share;
    a far-future sentinel advances the watermark so windows finalize."""
    import datetime as dt

    from pdf_extractor_spark.streaming.ingest import error_budget_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def turn(i, ts, text):
        return ("c-%06d" % i, 0, "user", text, "", ts)

    rows = []
    # 20:00-20:05 burst: 8 good + 2 bad -> bad share 0.2 in every
    # covering window
    base = t0 + dt.timedelta(hours=20)
    for i in range(8):
        rows.append(turn(i, base + dt.timedelta(minutes=i % 5), "ok text"))
    rows.append(turn(8, base + dt.timedelta(minutes=1), ""))
    rows.append(turn(9, base + dt.timedelta(minutes=2), None))
    # watermark sentinel far in the future finalizes everything above
    rows.append(turn(99, t0 + dt.timedelta(days=2), "sentinel"))
    spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    ).coalesce(1).write.parquet(in_dir)

    q = (
        error_budget_stream(stream_transcripts(spark, in_dir), budget=0.1)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir).orderBy("start").collect()
    burst = [r for r in out if r["n_turns"] == 10]
    # 1h window sliding by 15m -> the 5-minute burst sits whole in 4
    assert len(burst) == 4
    for r in burst:
        assert r["n_bad"] == 2
        assert r["bad_share"] == 0.2
        assert r["burn_rate"] == 2.0
        assert r["over_budget"] is True
    assert all(r["over_budget"] is False
               for r in out if r["n_turns"] == 1)  # the sentinel windows


def test_stream_stream_interval_join_matches_within_bound(spark, tmp_path):
    """Turns join annotations arriving within 30 minutes AFTER the turn;
    an annotation outside the bound (or before the turn) never emits."""
    import datetime as dt

    from pdf_extractor_spark.streaming.ingest import (
        join_turn_annotation_streams,
    )

    turns_dir = str(tmp_path / "turns")
    ann_dir = str(tmp_path / "ann")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    spark.createDataFrame(
        [
            ("c-1", 0, "user", "hello", "", t0),
            ("c-1", 1, "assistant", "hi", "", t0 + dt.timedelta(minutes=1)),
            ("c-2", 0, "user", "lonely", "", t0),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    ).coalesce(1).write.parquet(turns_dir)
    spark.createDataFrame(
        [
            ("c-1", 0, t0 + dt.timedelta(minutes=5), "safe"),     # in bound
            ("c-1", 1, t0 + dt.timedelta(hours=2), "late"),       # too late
            ("c-2", 0, t0 - dt.timedelta(minutes=5), "early"),    # before
        ],
        "conv_id string, turn_idx int, ann_ts timestamp, label string",
    ).coalesce(1).write.parquet(ann_dir)

    ann_stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, ann_ts timestamp, label string"
        ).parquet(ann_dir)
    )
    q = (
        join_turn_annotation_streams(
            stream_transcripts(spark, turns_dir), ann_stream
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 1
    assert (out[0]["conv_id"], out[0]["turn_idx"], out[0]["label"]) == (
        "c-1", 0, "safe")
