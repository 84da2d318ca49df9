"""Layout-parse tests on hand-built virtual pages.

Geometry expectations derive from the reference algorithms
(/root/reference/pdf_extractor.py:66-326) applied to the character grid
documented in core/layout.py (1 px per char, 12 px per line, margins 8/10).
"""

from pdf_extractor_spark.core.layout import (
    Word,
    VirtualPage,
    detect_columns,
    extract_page_text,
    extract_turn,
    parse_header,
    tokenize_turn,
    words_to_lines,
)


class TestTokenize:
    def test_grid_positions(self):
        page = tokenize_turn("ab cd\nxyz")
        assert page.words[0] == Word(8.0, 10.0, 10.0, "ab")
        assert page.words[1] == Word(11.0, 13.0, 10.0, "cd")
        assert page.words[2] == Word(8.0, 11.0, 22.0, "xyz")

    def test_deterministic(self):
        assert tokenize_turn("same text") == tokenize_turn("same text")


class TestColumns:
    def test_single_dense_column(self):
        # word starts cover every 5px bucket → no gap → one column
        words = [Word(8 + 5 * i, 8 + 5 * i + 4, 10.0, "w") for i in range(20)]
        cols = detect_columns(words, 612.0)
        assert len(cols) == 1

    def test_two_columns_with_gutter(self):
        words = []
        for line in range(10):
            top = 10.0 + line * 12
            for c in range(0, 56, 4):  # left col starts 8..63
                words.append(Word(8.0 + c, 10.0 + c, top, "l"))
            for c in range(80, 136, 4):  # right col starts 88..143
                words.append(Word(8.0 + c, 10.0 + c, top, "r"))
        cols = detect_columns(words, 612.0)
        assert len(cols) == 2
        (l0, l1), (r0, r1) = cols
        assert l1 <= r0

    def test_empty_words_full_width(self):
        assert detect_columns([], 400.0) == [(0.0, 400.0)]


class TestLines:
    def test_reading_order(self):
        words = [
            Word(50, 55, 10.0, "world"),
            Word(8, 13, 10.0, "hello"),
            Word(8, 11, 22.0, "row2"),
        ]
        assert words_to_lines(words) == "hello world\nrow2"

    def test_y_tolerance_merges_close_words(self):
        words = [Word(8, 10, 10.0, "a"), Word(20, 22, 13.0, "b")]
        assert words_to_lines(words) == "a b"  # Δtop=3 ≤ 4 → same line

    def test_y_gap_splits(self):
        words = [Word(8, 10, 10.0, "a"), Word(8, 10, 20.0, "b")]
        assert words_to_lines(words) == "a\nb"


class TestHeader:
    def _page(self, first_line: str, body: str = "body text here") -> VirtualPage:
        return tokenize_turn(first_line + "\n" + body)

    def test_chapter_page_format(self):
        p = self._page("ENGINE 7-5")
        assert parse_header(p.words, p.height) == ("7-5", "ENGINE")

    def test_plain_int_page(self):
        p = self._page("12 BRAKES")
        assert parse_header(p.words, p.height) == ("12", "BRAKES")

    def test_year_rejected(self):
        p = self._page("ENGINE 1999")
        num, chap = parse_header(p.words, p.height)
        assert num is None
        assert chap == "ENGINE 1999"

    def test_four_digit_rejected(self):
        p = self._page("ENGINE 4711")
        num, chap = parse_header(p.words, p.height)
        assert num is None

    def test_first_match_wins_rest_is_chapter(self):
        p = self._page("3-1 FUEL 22")
        num, chap = parse_header(p.words, p.height)
        assert num == "3-1"
        assert chap == "FUEL 22"  # second numeric token joins the chapter

    def test_corner_fallback(self):
        # no number in the first line; lone int far right in the top band
        words = [
            Word(8, 50, 10.0, "Some"),
            Word(52, 90, 10.0, "Title"),
            Word(580, 585, 30.0, "42"),  # x0 ≥ 0.75*page_w, top ≤ 0.08*h
            Word(8, 30, 400.0, "body"),
        ]
        num, chap = parse_header(words, 800.0)
        assert num == "42"
        assert chap == "Some Title"


class TestPageAssembly:
    def test_footer_band_words_masked(self):
        # word inside the bottom 12px band vanishes from content
        words = [Word(8, 20, 10.0, "keep"), Word(8, 20, 95.0, "drop")]
        page = VirtualPage(words, 612.0, 100.0)
        text, _, _ = extract_page_text(page)
        assert "keep" in text and "drop" not in text

    def test_empty_page(self):
        assert extract_turn("") == ("", None, None)
        assert extract_turn("   \n  ") == ("", None, None)

    def test_prose_roundtrip_with_header(self):
        raw = "ENGINE 7-5\n" + "\n".join(
            "torque valve sensor manifold gasket piston coolant bracket relay"
            for _ in range(6)
        )
        text, num, chap = extract_turn(raw)
        assert num == "7-5" and chap == "ENGINE"
        assert "torque valve sensor" in text

    def test_footer_watermark_line_stripped(self):
        raw = (
            "ENGINE 2-3\n"
            + "valve sensor manifold gasket piston coolant bracket relay wire\n" * 5
            + "Downloaded from www.manualslib.com manuals search engine"
        )
        text, _, _ = extract_turn(raw)
        assert "manualslib" not in text.lower()

    def test_cid_and_hyphen_cleanup(self):
        raw = "HEADER 1-1\n(cid:121) assem-\nblies (cid:999) are ready here today"
        text, _, _ = extract_turn(raw)
        assert "assemblies" in text
        assert "•" in text and "(cid:" not in text

    def test_two_column_reading_order(self):
        # Columns must be histogram-dense for the 5px gap detector: vary the
        # word length per line so left-edge buckets are covered (a line of
        # 2-char words alone covers every 3rd x-offset).
        rows = []
        for i in range(10):
            wl = (i % 5) + 2
            left = (("x" * wl) + " ") * (56 // (wl + 1))
            right = left.replace("x", "y")
            rows.append(f"{left.rstrip():<56}" + " " * 18 + right.rstrip())
        text, _, _ = extract_turn("\n".join(rows))
        assert "\n\n" in text  # column join separator
        # every left-column token precedes every right-column token
        assert text.rindex("x") < text.index("y")
