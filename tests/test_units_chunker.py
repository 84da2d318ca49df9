"""Unit-splitter and chunker tests — expectations hand-derived from
/root/reference/api.py:847-945 (units) and api.py:948-1111 (chunking)."""

from pdf_extractor_spark.core.chunker import TurnRecord, chunk_conversation, _trim_overlap
from pdf_extractor_spark.core.units import split_semantic_units


class TestUnits:
    def test_allcaps_header_standalone(self):
        assert split_semantic_units("ENGINE OVERHAUL") == ["ENGINE OVERHAUL"]

    def test_titlecase_header(self):
        assert split_semantic_units("Fuel System Overview") == ["Fuel System Overview"]

    def test_section_label_header(self):
        assert split_semantic_units("Chapter 3 introduction to brakes") == [
            "Chapter 3 introduction to brakes"
        ]

    def test_long_upper_line_is_not_header(self):
        text = ("A" * 60) + " " + ("B" * 60)  # 121 chars, isupper, too long
        assert split_semantic_units(text) == [text]

    def test_short_bullet_list_kept_whole(self):
        text = "• one item\n• two item\n• three item"
        assert split_semantic_units(text) == [text]

    def test_long_bullet_list_split_per_bullet(self):
        bullets = [f"• {'word ' * 80}{i}" for i in range(5)]  # > 1500 chars total
        text = "\n".join(bullets)
        assert len(text) > 1500
        assert split_semantic_units(text) == bullets

    def test_numbered_list_split(self):
        items = [f"{i}. {'word ' * 80}end" for i in range(1, 6)]
        out = split_semantic_units("\n".join(items))
        assert out == items

    def test_long_paragraph_sentence_repack(self):
        sent = "The torque value must be checked before installation proceeds. "
        para = (sent * 30).strip()  # ~1900 chars, > 1200 threshold
        out = split_semantic_units(para)
        assert len(out) > 1
        assert all(len(u) <= 900 for u in out)
        assert " ".join(out) == para  # nothing lost, only re-packed

    def test_midsize_paragraph_single_unit(self):
        para = "word " * 100  # 500 chars
        assert split_semantic_units(para.strip()) == [para.strip()]

    def test_empty(self):
        assert split_semantic_units("") == []


def _mk(idx, text, printed=None, chapter=None):
    return TurnRecord(idx, text, printed, chapter)


class TestChunker:
    def test_small_conv_single_chunk(self):
        chunks = chunk_conversation([_mk(0, "hello world"), _mk(1, "second turn")])
        assert len(chunks) == 1
        c = chunks[0]
        assert c["content"] == "hello world\n\nsecond turn"
        assert c["turns"] == [0, 1]
        assert c["start_turn"] == 0 and c["end_turn"] == 1
        assert c["char_count"] == len("hello world\n\nsecond turn")

    def test_chunk_split_and_overlap_carry(self):
        # Unit A fills a chunk; unit B forces a split; overlap text is the
        # tail of A trimmed to the last sentence boundary.
        a = ("First sentence here. " * 40).strip()  # 839 chars, single unit
        b = ("Second block text now. " * 40).strip()
        chunks = chunk_conversation(
            [_mk(0, a), _mk(1, b)], chunk_size=800, overlap=100
        )
        assert len(chunks) >= 2
        c0, c1 = chunks[0], chunks[1]
        assert c0["content"] == a
        assert c0["turns"] == [0]
        # overlap: last 100 chars of a, stripped, cut after last ". "
        window = a[-100:].strip()
        import re
        last = None
        for m in re.finditer(r"(?<=[.!?])\s+", window):
            last = m
        expected_overlap = window[last.end():]
        assert c1["content"].startswith(expected_overlap + "\n\n")
        # turn tracking after carry: {max(prev)} ∪ {new}
        assert c1["turns"] == [0, 1]

    def test_overlap_fallback_40pct(self):
        # no sentence boundary / paragraph break in the window → keep last 60%
        window = "x" * 50
        assert _trim_overlap(window) == "x" * 30

    def test_lineage_sets(self):
        chunks = chunk_conversation(
            [
                _mk(0, "alpha text", printed="1-1", chapter="ENGINE"),
                _mk(1, "beta text", printed="1-2", chapter="ENGINE"),
            ]
        )
        c = chunks[0]
        assert c["printed_pages"] == ["1-1", "1-2"]
        assert c["chapters"] == ["ENGINE"]

    def test_empty_turns_skipped(self):
        chunks = chunk_conversation([_mk(0, ""), _mk(1, "  "), _mk(2, "real")])
        assert len(chunks) == 1
        assert chunks[0]["turns"] == [2]

    def test_char_count_measures_unstripped(self):
        # char_count is len(accumulator) pre-strip (api.py:1040); for a
        # single-unit chunk the two coincide — the distinction is covered by
        # the golden corpus where multi-unit accumulators occur.
        chunks = chunk_conversation([_mk(0, "only unit")])
        assert chunks[0]["char_count"] == len("only unit")

    def test_chunk_cap(self):
        turns = [_mk(i, f"Unit number {i} with some padding text here.") for i in range(400)]
        chunks = chunk_conversation(turns, chunk_size=50, overlap=0, max_chunks=10)
        assert len(chunks) == 10

    def test_unsorted_input_sorted_by_turn_idx(self):
        chunks = chunk_conversation([_mk(1, "second"), _mk(0, "first")])
        assert chunks[0]["content"] == "first\n\nsecond"

    def test_no_overlap_mode(self):
        a = "A" * 60
        b = "B" * 60
        chunks = chunk_conversation([_mk(0, a), _mk(1, b)], chunk_size=70, overlap=0)
        assert [c["content"] for c in chunks] == [a, b]
        assert chunks[1]["turns"] == [1]
