"""``transformWithState`` variant of the cross-batch conversation assembler.

Same contract as ``streaming/stateful.py`` (buffer turns per conversation
across micro-batches; emit the WHOLE conversation's chunks after
``idle_timeout_ms`` of processing-time silence), on Spark 4's
arbitrary-stateful-processing API instead of ``applyInPandasWithState``:

* explicit named state variables (``getValueState``) instead of one opaque
  state tuple;
* explicit timers (``registerTimer`` / ``deleteTimer`` /
  ``handleExpiredTimer``) instead of ``setTimeoutDuration`` — exactly one
  live timer per conversation (each arrival deletes the previous one), so
  timer state is O(active conversations);
* requires the RocksDB state-store provider (``run_stream_tws`` sets it),
  which is also the right provider at scale: changelog-checkpointed,
  memory-bounded, compacting.

Shared semantics live in one place: ``_fold_buffer`` (update-time state
bound, turn_idx-sorted merge) and ``process_conversation_group`` (the
order-enforcing chunk fold) are imported from the sibling modules, so both
assemblers emit byte-identical output and the same restart/out-of-order
tests cover each (tests/test_streaming_tws.py).

Runtime gate: transformWithState's Python state protocol needs the
``protobuf`` package (absent in this sandbox, like the Iceberg runtime
jar) — ``tws_available()`` reports it, the entry points raise loudly
without it, and the processor's buffer/timer/emit semantics are unit-
tested against a stub handle so the logic is pinned even where the
protocol layer can't run; the end-to-end tests un-skip wherever protobuf
exists.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from ..config import MAX_TURNS_PER_CONV
from ..operators.chunk import MULTIPLEX_SCHEMA, process_conversation_group
from .stateful import _BUFFER_COLS, _fold_buffer

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithState's Python state protocol is protobuf-based; the
    API surface imports fine without it, but the first query crashes the
    state-schema driver worker.  Gate on the real requirement."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _require_tws() -> None:
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python<->JVM state protocol); install protobuf, or use "
            "streaming.stateful.run_stream_stateful — the "
            "applyInPandasWithState assembler with identical semantics"
        )


class ConversationAssembler(StatefulProcessor):
    """Buffer turns per conv_id; emit chunks whole on idle timeout."""

    def __init__(self, idle_timeout_ms: int, max_turns: int):
        self._idle_timeout_ms = idle_timeout_ms
        self._max_turns = max_turns

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._buf = handle.getValueState("buffered", "blob binary")
        self._timer = handle.getValueState("live_timer", "expiry_ms bigint")

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        new = pd.concat(list(rows), ignore_index=True)[_BUFFER_COLS]
        prev = self._buf.get()
        self._buf.update((_fold_buffer(prev[0] if prev else None,
                                       new, self._max_turns),))
        # exactly one live timer: roll it forward on every arrival
        old_timer = self._timer.get()
        if old_timer is not None:
            self._handle.deleteTimer(old_timer[0])
        expiry = timerValues.getCurrentProcessingTimeInMs() + self._idle_timeout_ms
        self._handle.registerTimer(expiry)
        self._timer.update((expiry,))
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        live = self._timer.get()
        if live is not None and expiredTimerInfo.getExpiryTimeInMs() < live[0]:
            return iter(())  # stale timer that raced deletion — superseded
        prev = self._buf.get()
        self._buf.clear()
        self._timer.clear()
        if prev is None:
            return iter(())
        buffered = pickle.loads(prev[0])
        if not len(buffered):
            return iter(())
        # process_conversation_group re-sorts by turn_idx — cross-batch
        # arrival order is never chunk order
        return iter(
            [process_conversation_group(buffered, max_turns=self._max_turns)]
        )

    def close(self) -> None:
        pass


def assemble_conversations_tws(
    extracted, idle_timeout_ms: int = 5_000, max_turns: int = MAX_TURNS_PER_CONV
):
    """Streaming extracted turns → multiplexed chunk+sentinel rows via
    ``transformWithStateInPandas`` (append mode, processing-time timers)."""
    _require_tws()
    return extracted.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=ConversationAssembler(idle_timeout_ms, max_turns),
        outputStructType=MULTIPLEX_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def run_stream_tws(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    idle_timeout_ms: int = 5_000,
    max_files_per_trigger: int | None = None,
    max_turns: int = MAX_TURNS_PER_CONV,
):
    """File-source stream → transformWithState assembly → parquet append.

    Sets the RocksDB state-store provider (required by transformWithState;
    session-wide conf, read at query start)."""
    _require_tws()
    from .ingest import extract_stream, stream_transcripts

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
    )
    assembled = assemble_conversations_tws(
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
