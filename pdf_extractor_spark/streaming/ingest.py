"""Structured Streaming ingest for continuously-arriving transcripts.

The reference's async-job layer (thread per upload, Redis progress, TTL
state — /root/reference/api.py:1668-1907, 190-222) is an orchestration
pattern for a continuous arrival stream; this module is its Spark-native
equivalent: a file-source stream of transcript parquet, the SAME stage-1
extraction pandas UDF (stateless → runs unmodified on a streaming
DataFrame), and per-micro-batch chunk folding + embedding + append via
``foreachBatch``, checkpointed so a killed stream resumes exactly where it
stopped (the streaming analog of plans/pipeline.py's batch checkpoints).

Exactly-once sink semantics: ``foreachBatch`` is at-least-once — a crash
between the sink write and the streaming-checkpoint commit replays the
micro-batch on restart.  The write here is IDEMPOTENT per batch: each
micro-batch lands in its own ``batch_id=N`` partition directory with
``mode("overwrite")``, so a replay overwrites the same path with the same
deterministic content instead of appending a duplicate copy.  Readers use
``read_stream_output`` (plain partition discovery; the ledger/quarantine
side dirs are underscore-prefixed and therefore invisible to it).

Whole-conversation-per-batch contract, ENFORCED: the chunk fold assumes a
conversation's turns land within one micro-batch (same invariant the
reference gets from one-PDF-per-request, api.py:2330-2337).  Instead of
silently emitting wrong chunks when an upstream sessionizer violates it,
each batch is checked against a per-batch ledger of previously-seen
conv_ids: a conversation that reappears in a later batch has its new rows
QUARANTINED (written to ``_quarantine/batch_id=N``, counted via
``quarantined_convs``) and the earlier chunks for that conversation are
thereby flagged as suspect — never silent wrong output.  Ledger storage
is the pluggable ``streaming.ledger.StreamLedger`` protocol:
``LocalParquetLedger`` (default, driver-local side dirs, refuses remote
URIs loudly) or ``IcebergLedger`` (catalog tables, the corpus-scale
path; runtime-gated) — the contract logic is identical either way.
Alternatively the fold moves to ``applyInPandasWithState``
(streaming/stateful.py).

``windowed_turn_rates`` shows the watermark + event-time window shape for
late-data-tolerant operational metrics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunk import chunk_conversations
from ..operators.enrich import add_embeddings
from ..operators.extract import extract_turns
from ..sources.transcripts import TRANSCRIPT_DDL
from .ledger import LocalParquetLedger, StreamLedger


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript parquet with the canonical schema."""
    reader = spark.readStream.schema(TRANSCRIPT_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def extract_stream(transcripts: DataFrame) -> DataFrame:
    """Stage-1 extraction on a streaming DataFrame — the pandas UDF is
    stateless, so the exact batch operator applies unchanged."""
    return extract_turns(transcripts, with_first_extract=True)


OBSERVATION_NAME = "ingest"


def observe_ingest(
    extracted: DataFrame, name: str = OBSERVATION_NAME
) -> DataFrame:
    """Attach per-micro-batch observed metrics to the extracted stream —
    the streaming leg of the pipeline's lineage/counters contract
    (plans/pipeline.py's totals, but live): ``Dataset.observe`` computes
    the aggregates inside the SAME job that writes the batch (no second
    scan, no extra action) and surfaces them on every
    ``StreamingQueryProgress`` under ``observedMetrics[name]``, where an
    operator dashboard or alert reads them per batch.  At cluster scale
    this replaces a side-channel count() per micro-batch — which would
    re-run stage 1's pandas UDF — with free map-side accumulation."""
    return extracted.observe(
        name,
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.when(F.col("parse_ok"), 0).otherwise(1)).alias(
            "parse_failures"
        ),
        F.sum(F.when(F.col("rejected_xss"), 1).otherwise(0)).alias(
            "xss_rejects"
        ),
        F.sum("bytes_in").alias("bytes_in"),
    )


def ingest_progress_metrics(query, name: str = OBSERVATION_NAME) -> dict:
    """Fold a (possibly stopped) streaming query's recentProgress into
    cumulative ingest counters: batches seen, turns, parse failures, XSS
    rejects, bytes parsed.  Empty micro-batches report NULL sums — they
    count as a batch with zero contribution."""
    totals = {
        "batches": 0,
        "turns": 0,
        "parse_failures": 0,
        "xss_rejects": 0,
        "bytes_in": 0,
    }
    for p in query.recentProgress:
        row = (p.observedMetrics or {}).get(name)
        if row is None:
            continue
        totals["batches"] += 1
        for k in ("turns", "parse_failures", "xss_rejects", "bytes_in"):
            v = row[k]
            totals[k] += int(v) if v is not None else 0
    return totals


def _batch_path(root: str, batch_id: int) -> str:
    return os.path.join(root, f"batch_id={batch_id}")


def process_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    output_dir: str,
    ledger: StreamLedger | None = None,
) -> None:
    """One micro-batch: quarantine contract violations, fold the rest.

    Idempotent by construction — every write targets a batch_id-derived
    path (or DELETEs its batch_id first, IcebergLedger) with overwrite,
    so an at-least-once replay reproduces byte-identical output instead
    of duplicating it.
    """
    spark = batch_df.sparkSession
    if ledger is None:
        ledger = LocalParquetLedger(output_dir)
    batch_df = batch_df.persist()

    seen = ledger.prior_seen(spark, batch_id)
    if seen is not None:
        violations = batch_df.join(seen, "conv_id", "left_semi").persist()
        good = batch_df.join(seen, "conv_id", "left_anti")
        n_violating = violations.select("conv_id").distinct().count()
        if n_violating:
            ledger.write_quarantine(violations, batch_id)
        violations.unpersist()
    else:
        good = batch_df

    multiplexed = add_embeddings(chunk_conversations(good))
    multiplexed.write.mode("overwrite").parquet(_batch_path(output_dir, batch_id))

    # ledger entry: every conv_id this batch carried (including quarantined
    # ones — re-reappearance stays quarantined)
    ledger.record_seen(batch_df, batch_id)
    batch_df.unpersist()


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    ledger: StreamLedger | None = None,
):
    """Stream transcripts → extracted/chunked/embedded parquet partitions.

    Stage 2's groupBy(conv_id) fold runs inside ``foreachBatch`` on each
    micro-batch.  See module docstring for the idempotent-write and
    conversation-quarantine protocols.  ``ledger`` defaults to
    ``LocalParquetLedger(output_dir)`` — constructed HERE so a remote
    output_dir fails at stream start, not silently per batch; pass an
    ``IcebergLedger`` for catalog-backed contract state at cluster scale.
    """
    if ledger is None:
        ledger = LocalParquetLedger(output_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_micro_batch(batch_df, batch_id, output_dir, ledger=ledger)

    writer = (
        observe_ingest(
            extract_stream(
                stream_transcripts(spark, input_dir, max_files_per_trigger)
            )
        )
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_output(spark: SparkSession, output_dir: str) -> DataFrame:
    """Committed multiplexed rows across all micro-batches (the batch_id
    partition column is an implementation detail and is dropped)."""
    return spark.read.parquet(output_dir).drop("batch_id")


def read_quarantine(
    spark: SparkSession, output_dir: str, ledger: StreamLedger | None = None
) -> DataFrame:
    """Extracted turn rows of conversations that violated the whole-
    conversation-per-batch contract (empty DataFrame if none)."""
    if ledger is None:
        ledger = LocalParquetLedger(output_dir)
    df = ledger.read_quarantine(spark)
    if df is None:
        from ..operators.extract import EXTRACT_STRUCT_SCHEMA

        return spark.createDataFrame(
            [], f"conv_id string, turn_idx int, {EXTRACT_STRUCT_SCHEMA.replace(': ', ' ')}"
        )
    return df


def quarantined_convs(
    spark: SparkSession, output_dir: str, ledger: StreamLedger | None = None
) -> int:
    """Operator metric: number of distinct conversations quarantined."""
    df = read_quarantine(spark, output_dir, ledger=ledger)
    return df.select("conv_id").distinct().count()


def dedup_stream(
    transcripts: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup — the in-flight analog of `dedup_exact` /
    `dedup_incremental`: re-arrivals of the same turn (same conv_id,
    turn_idx and text digest) within the watermark horizon are dropped
    before they reach the extraction stage, so an at-least-once upstream
    (replayed Kafka offsets, retried uploads) can't double-feed the
    pipeline.

    ``dropDuplicatesWithinWatermark`` keys state by the digest triple and
    EVICTS it once the watermark passes — state is bounded by arrival
    rate × watermark, not by stream lifetime (a plain dropDuplicates on a
    stream would grow state forever; at 10^12 turns that is the
    difference between a working job and an OOM).  Only the 16-byte md5
    and the two key columns sit in the state store, never the text."""
    return (
        transcripts.withColumn("turn_digest", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "turn_digest"])
        .drop("turn_digest")
    )


def windowed_turn_rates(
    transcripts: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time turn rates per window with late-data tolerance: turns
    arriving later than the watermark past their event time are dropped
    from the aggregation instead of growing state forever."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("chars_in"),
        )
        .select("w.start", "w.end", "role", "n_turns", "chars_in")
    )


def session_windowed_conv_activity(
    transcripts: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session-window activity per conversation: turns group into
    DYNAMIC-length sessions that close after ``gap`` of event-time
    silence — `F.session_window` is the streaming-native spelling of the
    batch `sessionize` query's lag + running-sum windows, with the
    window boundaries maintained by the state store instead of a sort.

    Contrast with `windowed_turn_rates`' fixed tumbling grid: a tumbling
    window splits one long conversation burst across buckets and glues
    unrelated bursts together; the session window follows the actual
    silence structure, which is what an idle-conversation eviction
    policy or an engagement dashboard wants.

    State/scale: one state row per OPEN session (conv, window) — closed
    sessions are finalized and evicted once the watermark passes their
    end + gap, so state is bounded by concurrent-conversation count, not
    stream lifetime.  In append mode rows emit only on finalization:
    a drain whose newest event time is within ``gap`` of a session's
    last turn keeps that session open (and un-emitted) by design —
    tests advance the watermark with a later batch to flush."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("chars_in"),
        )
        .select("conv_id", "w.start", "w.end", "n_turns", "chars_in")
    )


def dedup_stream_vs_corpus(
    transcripts: DataFrame,
    corpus_digests: DataFrame,
    broadcast: bool = False,
) -> DataFrame:
    """Stream-STATIC anti-join dedup — the production 'drop re-crawls of
    what the corpus already holds' gate: each micro-batch of arriving
    turns is filtered against the persisted corpus digest table (the
    batch analog is `dedup_incremental`).  The stream side carries no
    join state at all (unlike a stream-stream join): Spark re-plans the
    static side per micro-batch, so a corpus table that grows between
    batches is picked up without restarting the stream.

    ``corpus_digests`` is a STATIC DataFrame with a ``turn_digest``
    column of md5 hex — 16-byte keys only, never text (the ledger/digest
    table the batch pipeline already maintains).  Pass ``broadcast=True``
    when the digest table is small (a per-tenant corpus, a bench set);
    leave it False at corpus scale so the join shuffles on the digest —
    or pre-bucket the digest table by the join key and let AQE pick the
    strategy.  For 10^10+ keys, put `decontaminate_bloom`'s Bloom filter
    in FRONT of this join as a map-side prefilter and keep this anti-join
    as the exact verifier of the Bloom's positives."""
    digests = corpus_digests.select("turn_digest")
    if broadcast:
        digests = F.broadcast(digests)
    return (
        transcripts.withColumn("turn_digest", F.md5("text"))
        .join(digests, "turn_digest", "left_anti")
        .drop("turn_digest")
    )


def error_budget_stream(
    transcripts: DataFrame,
    budget: float = 0.01,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    bad: "F.Column | None" = None,
) -> DataFrame:
    """Sliding-window error-budget monitor — the streaming twin of the
    batch `slo_burn_rate` catalog op: per (window, slide) bucket the
    arriving-turn count, the bad-turn count, the bad share, the burn
    rate against ``budget``, and the alert flag.  SLIDING windows (the
    capability `windowed_turn_rates`' tumbling grid lacks) are what a
    pager wants: a burst straddling a tumbling boundary halves into two
    innocent buckets, while a 15-minute slide sees it whole.

    ``bad`` defaults to the cheap arrival-corruption predicate (NULL or
    empty text); pass any Column to monitor a different failure class.

    State/scale: one state row per open (window) bucket — window/slide
    of 1h/15m means each event lands in 4 buckets, state is bounded by
    watermark horizon x 4, and buckets finalize (append mode) once the
    watermark passes their end."""
    bad_col = bad if bad is not None else (
        F.col("text").isNull() | (F.length(F.col("text")) == 0)
    )
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(bad_col, 1).otherwise(0)).alias("n_bad"),
        )
        .select(
            "w.start", "w.end", "n_turns", "n_bad",
            F.round(F.col("n_bad") / F.col("n_turns"), 4).alias("bad_share"),
            F.round(F.col("n_bad") / F.col("n_turns") / F.lit(budget), 4)
              .alias("burn_rate"),
            (F.col("n_bad") / F.col("n_turns") > F.lit(budget))
              .alias("over_budget"),
        )
    )


def join_turn_annotation_streams(
    turns: DataFrame,
    annotations: DataFrame,
    max_delay: str = "30 minutes",
    wm_turns: str = "10 minutes",
    wm_annotations: str = "10 minutes",
) -> DataFrame:
    """STREAM-STREAM interval join — the last Structured Streaming join
    mode the module lacked: arriving turns pick up annotation rows
    (human labels, tool acks, safety verdicts) for the same (conv_id,
    turn_idx) that arrive within ``max_delay`` AFTER the turn's event
    time.  The batch analog is a plain equi-join; on streams the time
    bound is not an optimization but the CORRECTNESS contract — without
    it Spark must hold every turn forever waiting for a possible future
    match, and state grows with stream lifetime.

    Both sides are watermarked and the join condition carries the
    event-time interval, so Spark derives state-eviction watermarks for
    BOTH state stores: a turn's state drops once ``ann_ts`` could no
    longer land inside its window, an annotation's once its turn could
    no longer arrive.  Inner-join rows emit as soon as both sides are
    present (no watermark wait on the emit path).

    ``annotations`` schema contract: ``conv_id string, turn_idx int,
    ann_ts timestamp`` plus any payload columns; payloads ride along
    un-inspected."""
    t = turns.withWatermark("ts", wm_turns).alias("t")
    a = annotations.withWatermark("ann_ts", wm_annotations).alias("a")
    return t.join(
        a,
        F.expr(
            "t.conv_id = a.conv_id AND t.turn_idx = a.turn_idx"
            " AND a.ann_ts >= t.ts"
            f" AND a.ann_ts <= t.ts + interval {max_delay}"
        ),
        "inner",
    ).drop(a.conv_id).drop(a.turn_idx)
