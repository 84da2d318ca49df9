"""Turn-order hardening: the overlap fold is order-dependent, but neither
batch ``applyInPandas`` nor ``applyInPandasWithState`` guarantees intra-group
row order — so the sort-by-turn_idx lives INSIDE ``process_conversation_group``
(reference sorts pages before chunking, api.py:964-968) and must hold under
adversarial arrival orders.  Also pins the stateful assembler's update-time
state bound (buffer ≤ max_turns + 1 rows regardless of arrival pattern).
"""

from __future__ import annotations

import pickle
import time

import pandas as pd
import pytest

from pdf_extractor_spark.core.oracle import STATUS_TOO_LONG
from pdf_extractor_spark.operators.chunk import (
    SENTINEL_INDEX,
    chunk_conversations,
    process_conversation_group,
)
from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.sources.transcripts import (
    TRANSCRIPT_DDL,
    generate_rows,
    rows_to_pandas,
)
from pdf_extractor_spark.streaming.stateful import _fold_buffer


def _extracted_pdf(spark, rows) -> pd.DataFrame:
    df = spark.createDataFrame(rows_to_pandas(rows), TRANSCRIPT_DDL)
    return extract_turns(df, with_first_extract=True).toPandas()


class TestGroupBodySort:
    def test_shuffled_group_rows_chunk_identically(self, spark):
        """process_conversation_group must be invariant to input row order."""
        rows = generate_rows(3, seed=23)
        pdf = _extracted_pdf(spark, rows)
        for conv_id, grp in pdf.groupby("conv_id"):
            want = process_conversation_group(
                grp.sort_values("turn_idx").reset_index(drop=True)
            )
            got_rev = process_conversation_group(
                grp.sort_values("turn_idx", ascending=False).reset_index(drop=True)
            )
            got_shuf = process_conversation_group(
                grp.sample(frac=1.0, random_state=7).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(want, got_rev)
            pd.testing.assert_frame_equal(want, got_shuf)

    def test_batch_pipeline_invariant_to_partition_shuffle(self, spark):
        """End-to-end: a randomly re-ordered extracted DataFrame chunks to
        the same result as the naturally-ordered one."""
        from pyspark.sql import functions as F

        rows = generate_rows(5, seed=29)
        df = spark.createDataFrame(rows_to_pandas(rows), TRANSCRIPT_DDL)
        ex = extract_turns(df, with_first_extract=True)
        want = (
            chunk_conversations(ex)
            .orderBy("conv_id", "chunk_index")
            .toPandas()
            .reset_index(drop=True)
        )
        scrambled = ex.orderBy(F.xxhash64("conv_id", "turn_idx")).repartition(7)
        got = (
            chunk_conversations(scrambled)
            .orderBy("conv_id", "chunk_index")
            .toPandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(want, got)


class TestStateBound:
    def _turn(self, idx: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": ["c0"],
                "turn_idx": [idx],
                "clean_text": [f"turn {idx} text"],
                "printed_page": [None],
                "chapter": [None],
                "rejected_xss": [False],
                "parse_ok": [True],
                "struct_warn": [0],
                "bytes_in": [100],
                "first_extract": [None],
            }
        )

    def test_buffer_rows_and_pickle_size_bounded(self):
        """Feeding many micro-batches for one conversation must not grow
        state past max_turns + 1 rows — bounded at UPDATE time."""
        max_turns = 5
        blob = None
        sizes = []
        for i in range(50):
            blob = _fold_buffer(blob, self._turn(i), max_turns)
            sizes.append(len(blob))
        buffered = pickle.loads(blob)
        assert len(buffered) == max_turns + 1
        # turn_idx-sorted truncation keeps the LOWEST indices deterministically
        assert list(buffered["turn_idx"]) == list(range(max_turns + 1))
        # pickle size plateaus once the cap is hit (no O(n) re-pickle growth)
        assert max(sizes[10:]) == min(sizes[10:])

    def test_out_of_order_merge_sorts_and_dedups(self):
        blob = _fold_buffer(None, self._turn(3), 10)
        blob = _fold_buffer(blob, pd.concat([self._turn(1), self._turn(3)]), 10)
        blob = _fold_buffer(blob, self._turn(0), 10)
        buffered = pickle.loads(blob)
        assert list(buffered["turn_idx"]) == [0, 1, 3]

    def test_overlong_buffer_emits_too_long_sentinel(self):
        max_turns = 3
        blob = None
        for i in range(10):
            blob = _fold_buffer(blob, self._turn(i), max_turns)
        out = process_conversation_group(pickle.loads(blob), max_turns=max_turns)
        assert len(out) == 1  # sentinel only, zero chunk rows
        assert out["chunk_index"].iloc[0] == SENTINEL_INDEX
        assert out["status"].iloc[0] == STATUS_TOO_LONG


@pytest.mark.slow
class TestStatefulOutOfOrder:
    def test_reversed_arrival_assembles_identically(self, spark, tmp_path):
        """The SECOND half of a conversation arrives in the FIRST micro-batch
        (and vice versa) — the assembled chunks must still equal the batch
        pipeline on the complete, correctly-ordered conversation."""
        from pdf_extractor_spark.streaming.stateful import run_stream_stateful

        in_dir, out_dir, ckpt = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        rows = generate_rows(1, seed=31)
        conv0 = sorted(rows, key=lambda r: r[1])
        split = len(conv0) // 2
        assert split >= 1

        # later turns land first; each file is additionally reverse-sorted
        first_file = list(reversed(conv0[split:]))
        second_file = list(reversed(conv0[:split]))
        spark.createDataFrame(rows_to_pandas(first_file), TRANSCRIPT_DDL)\
            .coalesce(1).write.mode("append").parquet(in_dir)
        time.sleep(1.1)  # distinct mtimes → deterministic oldest-first order
        spark.createDataFrame(rows_to_pandas(second_file), TRANSCRIPT_DDL)\
            .coalesce(1).write.mode("append").parquet(in_dir)

        q = run_stream_stateful(
            spark, in_dir, out_dir, ckpt,
            idle_timeout_ms=2000, max_files_per_trigger=1,
        )
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
            assert got is not None, "no output before deadline"
        finally:
            q.stop()

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

    def test_overlong_conversation_rejected_with_bounded_state(self, spark, tmp_path):
        """A conversation exceeding max_turns, drip-fed across micro-batches,
        must emit exactly one failed(too_many_turns) sentinel and no chunks —
        with state bounded at update time (cap honored by _fold_buffer,
        pinned above; this pins the end-to-end reject)."""
        from pdf_extractor_spark.streaming.stateful import run_stream_stateful

        in_dir, out_dir, ckpt = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        rows = sorted(generate_rows(1, seed=37), key=lambda r: r[1])
        assert len(rows) >= 4, "fixture conversation too short for the cap"
        max_turns = 2  # far below the real MAX_TURNS_PER_CONV, same code path
        split = len(rows) // 2
        spark.createDataFrame(rows_to_pandas(rows[:split]), TRANSCRIPT_DDL)\
            .coalesce(1).write.mode("append").parquet(in_dir)
        time.sleep(1.1)
        spark.createDataFrame(rows_to_pandas(rows[split:]), TRANSCRIPT_DDL)\
            .coalesce(1).write.mode("append").parquet(in_dir)

        q = run_stream_stateful(
            spark, in_dir, out_dir, ckpt,
            idle_timeout_ms=2000, max_files_per_trigger=1, max_turns=max_turns,
        )
        try:
            got = None
            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    cand = spark.read.parquet(out_dir)
                    if cand.count() >= 1:
                        got = cand
                        break
                except Exception:
                    pass
                time.sleep(2)
            assert got is not None, "no output before deadline"
        finally:
            q.stop()

        out = got.toPandas()
        assert len(out) == 1  # sentinel only — the reject yields zero chunks
        assert out["chunk_index"].iloc[0] == SENTINEL_INDEX
        assert out["status"].iloc[0] == STATUS_TOO_LONG
        # num_turns reflects the BOUNDED buffer, not the unbounded stream
        assert out["num_turns"].iloc[0] == max_turns + 1
