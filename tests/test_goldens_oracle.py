"""Golden stability + property tests (FIXTURES.md §2 and §4).

The oracle re-runs over the seeded corpus and must reproduce the checked-in
goldens exactly (guards against accidental behaviour drift in core/).  The
property tests assert the invariants the reference's inspect.py eyeballs
(/root/reference/inspect.py:168-194) plus the resource caps.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
from make_goldens import build_goldens  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "goldens"


@pytest.fixture(scope="module")
def fresh():
    return build_goldens()


@pytest.fixture(scope="module")
def golden():
    return {
        name: json.loads((GOLDEN_DIR / f"{name}.json").read_text(encoding="utf-8"))
        for name in ("turns", "chunks", "docs")
    }


class TestGoldenStability:
    def test_turns_exact(self, fresh, golden):
        assert fresh["turns"] == golden["turns"]

    def test_chunks_exact(self, fresh, golden):
        assert fresh["chunks"] == golden["chunks"]

    def test_docs_exact(self, fresh, golden):
        assert fresh["docs"] == golden["docs"]


class TestChunkInvariants:
    def test_content_nonempty(self, golden):
        assert all(len(c["content"]) > 0 for c in golden["chunks"])

    def test_chunk_index_dense_per_conv(self, golden):
        by_conv: dict[str, list[int]] = {}
        for c in golden["chunks"]:
            by_conv.setdefault(c["conv_id"], []).append(c["chunk_index"])
        for conv, idxs in by_conv.items():
            assert sorted(idxs) == list(range(len(idxs))), conv

    def test_turn_spans(self, golden):
        for c in golden["chunks"]:
            assert c["turns"] == sorted(set(c["turns"])) and c["turns"]
            assert c["start_turn"] == min(c["turns"])
            assert c["end_turn"] == max(c["turns"])

    def test_chunk_growth_rule(self, golden):
        # a chunk only exceeds CHUNK_SIZE when a single unit does
        # (api.py:1028-1031): conservative check — oversized chunks must not
        # contain a unit separator that would have allowed a split.
        from pdf_extractor_spark.config import CHUNK_SIZE

        for c in golden["chunks"]:
            if c["char_count"] > CHUNK_SIZE + 500:
                # big chunk ⇒ dominated by one oversized unit; the accumulated
                # prefix before it stays within chunk_size + one separator
                assert len(c["content"].split("\n\n")[-1]) > CHUNK_SIZE - 500

    def test_printed_pages_not_years(self, golden):
        plain_int = re.compile(r"^\d+$")
        for c in golden["chunks"]:
            for p in c["printed_pages"]:
                if plain_int.match(p):
                    assert not (1800 <= int(p) <= 2099), p

    def test_overlap_continuity(self, golden):
        # chunk k+1 must begin with carried text or a fresh unit; when a carry
        # happened, chunk k+1's first turn set includes chunk k's last turn
        by_conv: dict[str, list[dict]] = {}
        for c in golden["chunks"]:
            by_conv.setdefault(c["conv_id"], []).append(c)
        for conv, cs in by_conv.items():
            cs.sort(key=lambda c: c["chunk_index"])
            for prev, cur in zip(cs, cs[1:]):
                assert cur["start_turn"] >= prev["start_turn"]

    def test_max_chunks_cap(self, golden):
        from pdf_extractor_spark.config import MAX_CHUNKS_PER_CONV

        counts: dict[str, int] = {}
        for c in golden["chunks"]:
            counts[c["conv_id"]] = counts.get(c["conv_id"], 0) + 1
        assert all(n <= MAX_CHUNKS_PER_CONV for n in counts.values())


class TestDocInvariants:
    def test_xss_convs_have_zero_chunks(self, golden):
        flagged = {d["conv_id"] for d in golden["docs"] if d["status"] != "embedded"}
        assert flagged, "fixture corpus must contain at least one rejected conv"
        chunk_convs = {c["conv_id"] for c in golden["chunks"]}
        assert not (flagged & chunk_convs)

    def test_chunk_counts_match(self, golden):
        counts: dict[str, int] = {}
        for c in golden["chunks"]:
            counts[c["conv_id"]] = counts.get(c["conv_id"], 0) + 1
        for d in golden["docs"]:
            assert counts.get(d["conv_id"], 0) == d["chunk_count"]

    def test_turn_flag_consistency(self, golden):
        flagged_turn_convs = {
            t["conv_id"] for t in golden["turns"] if t["rejected_xss"]
        }
        failed_docs = {d["conv_id"] for d in golden["docs"] if d["status"] == "failed(xss)"}
        assert flagged_turn_convs == failed_docs
