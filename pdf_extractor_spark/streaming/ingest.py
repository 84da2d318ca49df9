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
thereby flagged as suspect — never silent wrong output.  At corpus scale
the ledger becomes an indexed Iceberg table (or the fold moves to
``applyInPandasWithState``); the protocol is identical.

``windowed_turn_rates`` shows the watermark + event-time window shape for
late-data-tolerant operational metrics.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunk import chunk_conversations
from ..operators.enrich import add_embeddings
from ..operators.extract import extract_turns
from ..sources.transcripts import TRANSCRIPT_DDL

_SEEN_DIR = "_seen"
_QUARANTINE_DIR = "_quarantine"

_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _require_local(output_dir: str) -> None:
    """The seen-conv ledger and quarantine listings use driver-local
    ``os.listdir`` — against an ``hdfs://``/``s3a://`` output_dir they would
    resolve to "no prior batches" and silently DISABLE the enforced
    whole-conversation contract.  Degrade loudly instead: at cluster scale
    the ledger moves to an Iceberg table (module docstring) or the fold to
    ``run_stream_stateful``."""
    if _URI_SCHEME.match(output_dir):
        raise ValueError(
            f"run_stream's ledger/quarantine protocol is driver-local-"
            f"filesystem only; got {output_dir!r}. Use a local/NFS path, "
            "an Iceberg-backed ledger, or run_stream_stateful — refusing "
            "to run with the whole-conversation contract silently disabled."
        )


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


def _batch_path(root: str, batch_id: int) -> str:
    return os.path.join(root, f"batch_id={batch_id}")


def _prior_seen_paths(output_dir: str, batch_id: int) -> list[str]:
    """Ledger partitions committed by batches STRICTLY BEFORE batch_id —
    a replayed batch must not see its own previous (possibly partial)
    attempt as 'prior', or every replay would quarantine itself."""
    _require_local(output_dir)
    seen_root = os.path.join(output_dir, _SEEN_DIR)
    if not os.path.isdir(seen_root):
        return []
    out = []
    for name in os.listdir(seen_root):
        m = re.fullmatch(r"batch_id=(\d+)", name)
        if m and int(m.group(1)) < batch_id:
            out.append(os.path.join(seen_root, name))
    return out


def process_micro_batch(
    batch_df: DataFrame, batch_id: int, output_dir: str
) -> None:
    """One micro-batch: quarantine contract violations, fold the rest.

    Idempotent by construction — every write targets a batch_id-derived
    path with overwrite, so an at-least-once replay reproduces byte-
    identical output instead of duplicating it.
    """
    spark = batch_df.sparkSession
    batch_df = batch_df.persist()

    prior = _prior_seen_paths(output_dir, batch_id)
    if prior:
        seen = spark.read.parquet(*prior).select("conv_id").distinct()
        violations = batch_df.join(seen, "conv_id", "left_semi").persist()
        good = batch_df.join(seen, "conv_id", "left_anti")
        n_violating = violations.select("conv_id").distinct().count()
        if n_violating:
            violations.write.mode("overwrite").parquet(
                _batch_path(os.path.join(output_dir, _QUARANTINE_DIR), batch_id)
            )
        violations.unpersist()
    else:
        good = batch_df

    multiplexed = add_embeddings(chunk_conversations(good))
    multiplexed.write.mode("overwrite").parquet(_batch_path(output_dir, batch_id))

    # ledger entry: every conv_id this batch carried (including quarantined
    # ones — re-reappearance stays quarantined)
    batch_df.select("conv_id").distinct().write.mode("overwrite").parquet(
        _batch_path(os.path.join(output_dir, _SEEN_DIR), batch_id)
    )
    batch_df.unpersist()


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream transcripts → extracted/chunked/embedded parquet partitions.

    Stage 2's groupBy(conv_id) fold runs inside ``foreachBatch`` on each
    micro-batch.  See module docstring for the idempotent-write and
    conversation-quarantine protocols.
    """
    _require_local(output_dir)  # fail at start, not silently per batch

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_micro_batch(batch_df, batch_id, output_dir)

    writer = (
        extract_stream(stream_transcripts(spark, input_dir, max_files_per_trigger))
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


def read_quarantine(spark: SparkSession, output_dir: str) -> DataFrame:
    """Extracted turn rows of conversations that violated the whole-
    conversation-per-batch contract (empty DataFrame if none)."""
    _require_local(output_dir)
    q_root = os.path.join(output_dir, _QUARANTINE_DIR)
    if not os.path.isdir(q_root) or not os.listdir(q_root):
        from ..operators.extract import EXTRACT_STRUCT_SCHEMA

        return spark.createDataFrame(
            [], f"conv_id string, turn_idx int, {EXTRACT_STRUCT_SCHEMA.replace(': ', ' ')}"
        )
    return spark.read.parquet(q_root).drop("batch_id")


def quarantined_convs(spark: SparkSession, output_dir: str) -> int:
    """Operator metric: number of distinct conversations quarantined."""
    df = read_quarantine(spark, output_dir)
    return df.select("conv_id").distinct().count()


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
