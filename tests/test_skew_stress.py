"""Skew-stress: the worst conversation the config admits, as ONE task.

Stage 2 processes a conversation atomically (groupBy(conv_id) →
applyInPandas), so the slowest possible task is a conversation at exactly
MAX_TURNS_PER_CONV with dense text — this pins that the single-task group
bound holds at the configured caps (time AND output rows), i.e. corpus
skew cannot produce an unbounded straggler.  Measured numbers live in
BENCH.md ("worst-case group" row).
"""

from __future__ import annotations

import time

import pandas as pd

from pdf_extractor_spark.config import MAX_CHUNKS_PER_CONV, MAX_TURNS_PER_CONV
from pdf_extractor_spark.operators.chunk import (
    SENTINEL_INDEX,
    process_conversation_group,
)

_SENT = "The torque value must be checked before installation proceeds. "


def _group(n_turns: int, chars_per_turn: int) -> pd.DataFrame:
    text = (_SENT * (chars_per_turn // len(_SENT) + 1))[:chars_per_turn]
    return pd.DataFrame(
        {
            "conv_id": ["c-max"] * n_turns,
            "turn_idx": list(range(n_turns)),
            "clean_text": [text] * n_turns,
            "printed_page": [None] * n_turns,
            "chapter": [None] * n_turns,
            "rejected_xss": [False] * n_turns,
            "parse_ok": [True] * n_turns,
            "struct_warn": [0] * n_turns,
            "bytes_in": [len(text)] * n_turns,
            "first_extract": [None] * n_turns,
        }
    )


def test_max_turns_conversation_is_a_bounded_single_task():
    """Exactly MAX_TURNS_PER_CONV turns, ~1.2k chars each (≈12M chars —
    beyond what MAX_CHUNKS_PER_CONV chunks can cover, so the output cap
    engages): must complete in one task within a generous wall bound
    (measured 0.4-0.5s; 30s allows the documented 3-5x sandbox noise and
    CI slowdowns) and emit exactly the capped chunk count + sentinel."""
    g = _group(MAX_TURNS_PER_CONV, 1200)
    t0 = time.time()
    out = process_conversation_group(g)
    elapsed = time.time() - t0
    assert elapsed < 30, f"worst-case group took {elapsed:.1f}s"
    n_chunks = int((out["chunk_index"] >= 0).sum())
    assert n_chunks == MAX_CHUNKS_PER_CONV  # cap engaged, not exceeded
    assert len(out) == MAX_CHUNKS_PER_CONV + 1  # + sentinel
    sent = out[out["chunk_index"] == SENTINEL_INDEX]
    assert sent["status"].iloc[0] == "embedded"
    assert sent["num_turns"].iloc[0] == MAX_TURNS_PER_CONV


def test_chunk_cap_holds_under_max_text_density():
    """MAX_TEXT_LENGTH-sized turns (the sanitize cap — densest admissible
    text): output stays capped and per-char cost stays linear (no
    accidental quadratic fold).  100 turns ≈ 10M chars here; the full
    10k-turn × 100k-char ceiling (1 GB text, ≈40s measured) extrapolates
    linearly and is recorded in BENCH.md rather than run per-CI."""
    from pdf_extractor_spark.config import MAX_TEXT_LENGTH

    g = _group(100, MAX_TEXT_LENGTH)
    t0 = time.time()
    out = process_conversation_group(g)
    elapsed = time.time() - t0
    assert elapsed < 30, f"dense group took {elapsed:.1f}s"
    assert int((out["chunk_index"] >= 0).sum()) == MAX_CHUNKS_PER_CONV
