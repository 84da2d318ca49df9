"""transformWithState assembler: processor semantics pinned against a stub
handle (buffer fold, timer roll-forward, stale-timer suppression, emit =
the batch chunk fold, state bound), plus the protobuf runtime gate and the
end-to-end tests that un-skip where the protocol layer exists.
"""

from __future__ import annotations

import pickle
import time

import pandas as pd
import pytest

from pdf_extractor_spark.core.oracle import STATUS_TOO_LONG
from pdf_extractor_spark.operators.chunk import (
    SENTINEL_INDEX,
    process_conversation_group,
)
from pdf_extractor_spark.streaming.stateful_tws import (
    ConversationAssembler,
    tws_available,
)


class _StubValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _StubHandle:
    def __init__(self):
        self.states: dict[str, _StubValueState] = {}
        self.registered: list[int] = []
        self.deleted: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _StubValueState())

    def registerTimer(self, ts):
        self.registered.append(ts)

    def deleteTimer(self, ts):
        self.deleted.append(ts)


class _StubTimerValues:
    def __init__(self, now_ms):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


class _StubExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


def _turns(idxs) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": ["c0"] * len(idxs),
            "turn_idx": list(idxs),
            "clean_text": [f"turn {i} body text here" for i in idxs],
            "printed_page": [None] * len(idxs),
            "chapter": [None] * len(idxs),
            "rejected_xss": [False] * len(idxs),
            "parse_ok": [True] * len(idxs),
            "struct_warn": [0] * len(idxs),
            "bytes_in": [100] * len(idxs),
            "first_extract": ["Title text" if i == 0 else None for i in idxs],
        }
    )


def _mk(idle_ms=1000, max_turns=100):
    proc = ConversationAssembler(idle_ms, max_turns)
    handle = _StubHandle()
    proc.init(handle)
    return proc, handle


class TestProcessorSemantics:
    def test_out_of_order_batches_emit_batch_fold_output(self):
        proc, handle = _mk()
        # second half arrives first, both halves internally reversed
        out1 = list(proc.handleInputRows(("c0",), iter([_turns([5, 4, 3])]),
                                         _StubTimerValues(10_000)))
        out2 = list(proc.handleInputRows(("c0",), iter([_turns([2, 1, 0])]),
                                         _StubTimerValues(11_000)))
        assert out1 == [] and out2 == []  # nothing emits before the timeout
        emitted = list(proc.handleExpiredTimer(
            ("c0",), _StubTimerValues(12_000), _StubExpiredTimerInfo(12_000)
        ))
        assert len(emitted) == 1
        want = process_conversation_group(_turns([0, 1, 2, 3, 4, 5]))
        pd.testing.assert_frame_equal(emitted[0], want)
        # state fully cleared after emission
        assert not handle.states["buffered"].exists()
        assert not handle.states["live_timer"].exists()

    def test_exactly_one_live_timer_rolls_forward(self):
        proc, handle = _mk(idle_ms=1000)
        for i, now in enumerate((10_000, 20_000, 30_000)):
            proc.handleInputRows(("c0",), iter([_turns([i])]),
                                 _StubTimerValues(now))
        assert handle.registered == [11_000, 21_000, 31_000]
        assert handle.deleted == [11_000, 21_000]  # previous timer always removed
        assert handle.states["live_timer"].get() == (31_000,)

    def test_stale_timer_is_suppressed(self):
        proc, handle = _mk(idle_ms=1000)
        proc.handleInputRows(("c0",), iter([_turns([0])]), _StubTimerValues(10_000))
        proc.handleInputRows(("c0",), iter([_turns([1])]), _StubTimerValues(10_500))
        # the 11_000 timer raced its deletion and fires anyway: ignored
        out = list(proc.handleExpiredTimer(
            ("c0",), _StubTimerValues(11_000), _StubExpiredTimerInfo(11_000)
        ))
        assert out == []
        assert handle.states["buffered"].exists()  # buffer untouched
        # the live timer (11_500) fires: emits
        out = list(proc.handleExpiredTimer(
            ("c0",), _StubTimerValues(11_500), _StubExpiredTimerInfo(11_500)
        ))
        assert len(out) == 1

    def test_state_bounded_and_overlong_rejected(self):
        proc, handle = _mk(max_turns=3)
        for i in range(10):
            proc.handleInputRows(("c0",), iter([_turns([i])]),
                                 _StubTimerValues(10_000 + i))
        blob = handle.states["buffered"].get()[0]
        assert len(pickle.loads(blob)) == 4  # max_turns + 1, bounded at update
        out = list(proc.handleExpiredTimer(
            ("c0",), _StubTimerValues(99_999), _StubExpiredTimerInfo(99_999)
        ))
        assert len(out) == 1 and len(out[0]) == 1
        assert out[0]["chunk_index"].iloc[0] == SENTINEL_INDEX
        assert out[0]["status"].iloc[0] == STATUS_TOO_LONG

    def test_empty_timer_fire_is_noop(self):
        proc, handle = _mk()
        out = list(proc.handleExpiredTimer(
            ("c0",), _StubTimerValues(10_000), _StubExpiredTimerInfo(10_000)
        ))
        assert out == []


def test_gate_raises_without_protobuf(spark):
    if tws_available():
        pytest.skip("protobuf present — gating path not applicable")
    from pdf_extractor_spark.streaming.stateful_tws import run_stream_tws

    with pytest.raises(RuntimeError, match="protobuf"):
        run_stream_tws(spark, "/tmp/in", "/tmp/out", "/tmp/ckpt")


@pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState needs the protobuf package (absent here)",
)
class TestTwsEndToEnd:
    """Mirrors tests/test_streaming.py's stateful tests on the TWS path —
    runs wherever protobuf is installed."""

    def test_cross_batch_assembly_matches_batch_pipeline(self, spark, tmp_path):
        from pdf_extractor_spark.operators.chunk import chunk_conversations
        from pdf_extractor_spark.operators.extract import extract_turns
        from pdf_extractor_spark.sources.transcripts import (
            TRANSCRIPT_DDL,
            generate_rows,
            rows_to_pandas,
        )
        from pdf_extractor_spark.streaming.stateful_tws import run_stream_tws

        in_dir, out_dir, ckpt = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        rows = generate_rows(2, seed=13)
        conv0 = sorted((r for r in rows if r[0] == "conv-000000"), key=lambda r: r[1])
        conv1 = sorted((r for r in rows if r[0] == "conv-000001"), key=lambda r: r[1])
        split = len(conv0) // 2
        spark.createDataFrame(rows_to_pandas(conv0[:split] + conv1), TRANSCRIPT_DDL)\
            .coalesce(1).write.mode("append").parquet(in_dir)
        time.sleep(1.1)
        spark.createDataFrame(rows_to_pandas(conv0[split:]), TRANSCRIPT_DDL)\
            .coalesce(1).write.mode("append").parquet(in_dir)

        q = run_stream_tws(
            spark, in_dir, out_dir, ckpt,
            idle_timeout_ms=2000, max_files_per_trigger=1,
        )
        try:
            got = None
            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    cand = spark.read.parquet(out_dir)
                    if cand.where(cand.chunk_index == SENTINEL_INDEX).count() == 2:
                        got = cand
                        break
                except Exception:
                    pass
                time.sleep(2)
            assert got is not None, "no output before deadline"
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
