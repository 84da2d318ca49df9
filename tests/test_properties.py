"""Property-based tests (hypothesis) — the chunker invariants the
reference's inspector eyeballs (/root/reference/inspect.py:168-194), held
for ALL inputs, not just the golden corpus.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_extractor_spark.config import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    MAX_CHUNKS_PER_CONV,
)
from pdf_extractor_spark.core.chunker import TurnRecord, chunk_conversation
from pdf_extractor_spark.core.oracle import extract_turn_fields
from pdf_extractor_spark.core.units import split_semantic_units

# text fragments biased toward the structures the splitter cares about
_FRAGMENTS = st.sampled_from([
    "Plain sentence about torque and valves. ",
    "ANOTHER HEADER\n",
    "• bullet one\n• bullet two\n",
    "1. step one\n2) step two\n",
    "word " * 300 + ". ",
    "\n\n",
    "Chapter 7 Cooling\n",
    "short\n",
    "x" * 50 + "  " + "y" * 40 + "\n",
])
_TURN_TEXT = st.lists(_FRAGMENTS, min_size=0, max_size=8).map("".join)
_CONV = st.lists(_TURN_TEXT, min_size=1, max_size=6)


def _records(texts: list[str]) -> list[TurnRecord]:
    recs = []
    for i, raw in enumerate(texts):
        f = extract_turn_fields(raw)
        recs.append(TurnRecord(i, f["clean_text"], f["printed_page"], f["chapter"]))
    return recs


@settings(max_examples=60, deadline=None)
@given(_CONV)
def test_chunk_indices_dense_and_counts_exact(texts):
    chunks = chunk_conversation(_records(texts))
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    for c in chunks:
        # Reference quirk preserved by design (/root/reference/api.py:1036,1040):
        # char_count = len(unstripped accumulator) while content is .strip()'d,
        # and the 40%-tail overlap fallback can start the accumulator with
        # whitespace — so char_count >= len(content), never exactly equal in
        # general.  The delta is bounded by the overlap carry.
        assert len(c["content"]) <= c["char_count"] <= len(c["content"]) + CHUNK_OVERLAP
        assert len(chunks) <= MAX_CHUNKS_PER_CONV


def test_char_count_unstripped_quirk_regression():
    """Pinned counterexample for the reference's unstripped char_count
    (/root/reference/api.py:1036 counts the raw accumulator, :1040 strips
    the emitted text).  The long paragraph forces the 40% overlap-tail
    fallback, whose carry leaves trailing whitespace in the accumulator —
    chunk 1 here emits char_count == len(content) + 1."""
    texts = [
        "ANOTHER HEADER\n• bullet one\n• bullet two\n",
        "Chapter 7 Cooling\n\n\n" + "word " * 300 + ". \n\n"
        + "x" * 50 + "  " + "y" * 40 + "\n",
        "Plain sentence about torque and valves. " * 3,
    ]
    chunks = chunk_conversation(_records(texts))
    deltas = [c["char_count"] - len(c["content"]) for c in chunks]
    assert any(d > 0 for d in deltas), "quirk no longer fires — chunker changed?"
    for c in chunks:
        assert len(c["content"]) <= c["char_count"] <= len(c["content"]) + CHUNK_OVERLAP


@settings(max_examples=60, deadline=None)
@given(_CONV)
def test_turn_lineage_monotone_and_in_range(texts):
    chunks = chunk_conversation(_records(texts))
    for c in chunks:
        assert c["turns"] == sorted(set(c["turns"]))
        assert c["start_turn"] == min(c["turns"])
        assert c["end_turn"] == max(c["turns"])
        assert all(0 <= t < len(texts) for t in c["turns"])
    # chunk start_turns never go backwards across the fold
    starts = [c["start_turn"] for c in chunks]
    assert starts == sorted(starts)


@settings(max_examples=60, deadline=None)
@given(_CONV)
def test_every_unit_lands_in_some_chunk(texts):
    """No content loss: every semantic unit of every turn appears verbatim
    in at least one chunk (overlap may duplicate, never drop)."""
    recs = _records(texts)
    chunks = chunk_conversation(recs)
    blob = " ".join(c["content"] for c in chunks)
    for r in recs:
        for unit in split_semantic_units(r.clean_text):
            assert unit in blob


@settings(max_examples=60, deadline=None)
@given(_CONV)
def test_chunk_size_bounded(texts):
    """A chunk exceeds CHUNK_SIZE by at most one unit plus the overlap
    carry (the fold emits when len > CHUNK_SIZE after appending)."""
    recs = _records(texts)
    max_unit = max(
        (len(u) for r in recs for u in split_semantic_units(r.clean_text)),
        default=0,
    )
    for c in chunk_conversation(recs):
        assert c["char_count"] <= CHUNK_SIZE + CHUNK_OVERLAP + max_unit + 4


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=400))
def test_extract_turn_fields_total_on_arbitrary_unicode(raw):
    """Stage-1 extraction is TOTAL: any unicode payload (surrogate-free —
    parquet/Arrow reject lone surrogates upstream) produces a well-formed
    field dict within the sanitize caps, never an exception."""
    from pdf_extractor_spark.config import MAX_TEXT_LENGTH

    f = extract_turn_fields(raw)
    assert isinstance(f["clean_text"], str)
    assert len(f["clean_text"]) <= MAX_TEXT_LENGTH
    assert f["char_count"] == len(f["clean_text"])
    assert isinstance(f["parse_ok"], bool)
    assert isinstance(f["rejected_xss"], bool)
    assert 0 <= f["struct_warn"] <= 2
    # no control chars survive sanitize (newlines/tabs normalized earlier)
    assert not any(ord(c) < 32 and c not in "\n" for c in f["clean_text"])


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_chunk_fold_total_on_arbitrary_unicode(raw):
    chunks = chunk_conversation(_records([raw, raw[::-1]]))
    for c in chunks:
        assert c["chunk_index"] >= 0 and c["content"]


# ---- round-3 primitives: Bloom filter + stateful buffer fold ----------------

@given(
    keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                  min_size=1, max_size=2000, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(keys):
    """For ANY int64 key set: every inserted key must probe True."""
    import numpy as np

    from pdf_extractor_spark.queries import _bloom_build, _bloom_probe

    arr = np.asarray(keys, dtype=np.int64)
    words, m = _bloom_build(arr)
    assert _bloom_probe(words, m, arr).all()


@given(
    keys=st.lists(st.integers(min_value=0, max_value=2**31),
                  min_size=1, max_size=500, unique=True),
    seed=st.integers(min_value=0, max_value=2**16),
)
@settings(max_examples=30, deadline=None)
def test_bloom_order_and_duplication_invariant(keys, seed):
    """Build is a pure set function: permuted and duplicated key lists
    produce the identical bit array."""
    import random

    import numpy as np

    from pdf_extractor_spark.queries import _bloom_build

    rng = random.Random(seed)
    shuffled = list(keys)
    rng.shuffle(shuffled)
    dup = shuffled + [rng.choice(shuffled) for _ in range(len(shuffled) // 2)]
    w1, m1 = _bloom_build(np.asarray(keys, dtype=np.int64))
    # duplicates change len(keys) and therefore sizing — compare at equal n
    w2, m2 = _bloom_build(np.asarray(shuffled, dtype=np.int64))
    assert m1 == m2 and (w1 == w2).all()
    assert len(dup) >= len(keys)  # duplication exercised


@given(
    idxs=st.lists(st.integers(min_value=0, max_value=300),
                  min_size=1, max_size=120),
    max_turns=st.integers(min_value=1, max_value=40),
    n_batches=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=50, deadline=None)
def test_fold_buffer_invariants(idxs, max_turns, n_batches):
    """For ANY arrival pattern: the buffer holds the max_turns+1 LOWEST
    distinct turn_idx values, sorted, with no duplicates — regardless of
    how the stream is split into batches or ordered within them."""
    import pickle

    import pandas as pd

    from pdf_extractor_spark.streaming.stateful import _fold_buffer

    def turn_frame(batch):
        return pd.DataFrame({
            "conv_id": ["c"] * len(batch), "turn_idx": batch,
            "clean_text": [f"t{i}" for i in batch],
            "printed_page": [None] * len(batch), "chapter": [None] * len(batch),
            "rejected_xss": [False] * len(batch), "parse_ok": [True] * len(batch),
            "struct_warn": [0] * len(batch), "bytes_in": [1] * len(batch),
            "first_extract": [None] * len(batch),
        })

    # split idxs round-robin into n_batches arrival chunks
    batches = [idxs[i::n_batches] for i in range(n_batches)]
    blob = None
    for b in batches:
        if b:
            blob = _fold_buffer(blob, turn_frame(b), max_turns)
    assert blob is not None
    buffered = pickle.loads(blob)
    want = sorted(set(idxs))[: max_turns + 1]
    assert list(buffered["turn_idx"]) == want
