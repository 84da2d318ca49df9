"""Structured Streaming ingest for continuously-arriving transcripts.

The reference's async-job layer (thread per upload, Redis progress, TTL
state — /root/reference/api.py:1668-1907, 190-222) is an orchestration
pattern for a continuous arrival stream; this module is its Spark-native
equivalent: a file-source stream of transcript parquet, the SAME stage-1
extraction pandas UDF (stateless → runs unmodified on a streaming
DataFrame), and per-micro-batch chunk folding + embedding + append via
``foreachBatch``, checkpointed so a killed stream resumes exactly where it
stopped (the streaming analog of plans/pipeline.py's batch checkpoints).

Contract: a conversation's turns must land within one micro-batch (the
upstream sessionizer emits whole conversations — same invariant the
reference gets from one-PDF-per-request).  Cross-batch conversation
assembly would need ``applyInPandasWithState``; the batch engine remains
the canonical path (SURVEY.md §2.11: the north rule does not require
streaming), so this module keeps the simpler whole-conversation-per-batch
contract and documents it.

``windowed_turn_rates`` shows the watermark + event-time window shape for
late-data-tolerant operational metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunk import chunk_conversations
from ..operators.enrich import add_embeddings
from ..operators.extract import extract_turns
from ..sources.transcripts import TRANSCRIPT_DDL


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


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream transcripts → extracted/chunked/embedded parquet appends.

    Stage 2's groupBy(conv_id) fold runs inside ``foreachBatch`` on each
    micro-batch (whole-conversation-per-batch contract above); the sink
    append plus the streaming checkpoint give the same no-duplicate resume
    the batch engine gets from its manifest protocol.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        multiplexed = add_embeddings(chunk_conversations(batch_df))
        multiplexed.write.mode("append").parquet(output_dir)

    writer = (
        extract_stream(stream_transcripts(spark, input_dir, max_files_per_trigger))
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
