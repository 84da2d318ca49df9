"""Stateful cross-batch conversation assembly (``applyInPandasWithState``).

``streaming/ingest.py`` enforces the whole-conversation-per-micro-batch
contract by QUARANTINE (explicit, counted, never silently wrong).  This
module is the ASSEMBLE alternative for upstreams that genuinely cannot
sessionize: turns buffer in per-conversation group state across micro-
batches, and when a conversation goes quiet for ``idle_timeout`` of
processing time it is chunked WHOLE — the same fold, on the complete turn
set, regardless of how arrival was split.

This is the Spark-native analog of the reference's per-request document
assembly (one PDF arrives complete per upload, api.py:2294-2337): here
"complete" is declared by silence instead of by request framing.

Scale notes:
* State per conversation is the buffered extracted turns, bounded AT
  UPDATE TIME: the buffer is truncated to MAX_TURNS_PER_CONV + 1 rows on
  every merge (``_fold_buffer``), so a pathological conversation arriving
  across many micro-batches caps both state size and the per-batch
  re-pickle cost; at emit the kept ``max_turns + 1`` rows still trip the
  ``failed(too_many_turns)`` reject.
* Turns may arrive in ANY order across and within micro-batches — the
  buffer is merged sorted by turn_idx, and ``process_conversation_group``
  re-sorts before the fold (the W1 invariant lives in the group body, not
  in arrival order).
* The shuffle key is conv_id — the same single shuffle the batch chunker
  uses; state lives with the partition, so turns for a conversation
  always land on its state.
* Emission is append-mode: a conversation's rows appear exactly once, on
  timeout.  A crashed-and-restarted query replays from the state-store
  checkpoint, so buffered turns survive restarts.
"""

from __future__ import annotations

import pickle

import pandas as pd

from ..config import MAX_TURNS_PER_CONV
from ..operators.chunk import MULTIPLEX_SCHEMA, process_conversation_group

# pickled buffered-turns DataFrame; SQL-typed state must be Spark types, and
# an opaque binary cell keeps the whole turn row intact without a 10-column
# state struct that would drift from the extract schema
_STATE_SCHEMA = "buffered binary"

_BUFFER_COLS = [
    "conv_id", "turn_idx", "clean_text", "printed_page", "chapter",
    "rejected_xss", "parse_ok", "struct_warn", "bytes_in", "first_extract",
]


def _fold_buffer(
    old_blob: bytes | None, new: pd.DataFrame, max_turns: int
) -> bytes:
    """Merge newly-arrived turns into the pickled buffer, BOUNDED at update
    time: the buffer is sorted by turn_idx and truncated to ``max_turns + 1``
    rows, so one pathological conversation arriving across many micro-batches
    cannot grow state (or the per-batch re-pickle cost) past the reject
    bound — ``max_turns + 1`` rows are kept, exactly enough for the
    ``n_turns > max_turns`` check in ``process_conversation_group`` to fire
    ``failed(too_many_turns)`` at emit."""
    if old_blob is not None:
        buffered = pd.concat([pickle.loads(old_blob), new], ignore_index=True)
    else:
        buffered = new
    buffered = (
        buffered.drop_duplicates(subset=["turn_idx"], keep="first")
        .sort_values("turn_idx", kind="stable")
        .iloc[: max_turns + 1]
        .reset_index(drop=True)
    )
    return pickle.dumps(buffered)


def assemble_conversations_stateful(
    extracted, idle_timeout_ms: int = 5_000, max_turns: int = MAX_TURNS_PER_CONV
):
    """Streaming extracted turns → multiplexed chunk+sentinel rows, with
    cross-batch assembly.  ``extracted`` must be a STREAMING DataFrame from
    ``extract_stream`` (with first_extract).  Returns a streaming
    DataFrame in append mode."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            (blob,) = state.get
            state.remove()
            buffered = pickle.loads(blob)
            if len(buffered):
                # process_conversation_group re-sorts by turn_idx itself —
                # cross-batch arrival order is never chunk order
                yield process_conversation_group(buffered, max_turns=max_turns)
            return
        new = pd.concat(list(pdfs), ignore_index=True)[_BUFFER_COLS]
        old_blob = state.get[0] if state.exists else None
        state.update((_fold_buffer(old_blob, new, max_turns),))
        state.setTimeoutDuration(idle_timeout_ms)

    return extracted.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=MULTIPLEX_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_stream_stateful(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    idle_timeout_ms: int = 5_000,
    max_files_per_trigger: int | None = None,
    max_turns: int = MAX_TURNS_PER_CONV,
):
    """File-source stream → stateful assembly → parquet append.

    Unlike ``run_stream`` (idempotent per-batch partitions + quarantine),
    rows here are emitted by the state machine exactly once per
    conversation (state-store checkpointing makes replay consistent), so a
    plain append sink is correct."""
    from .ingest import extract_stream, stream_transcripts

    assembled = assemble_conversations_stateful(
        extract_stream(stream_transcripts(spark, input_dir, max_files_per_trigger)),
        idle_timeout_ms=idle_timeout_ms,
        max_turns=max_turns,
    )
    return (
        assembled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
