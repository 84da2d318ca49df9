"""Unit tests for textnorm — expectations hand-derived from the reference
semantics (/root/reference/pdf_extractor.py:24-63, api.py:353-381,720-766)."""

from pdf_extractor_spark.core.textnorm import (
    drop_footer_lines,
    normalize_text,
    repair_hyphenation,
    sanitize_text,
    substitute_cids,
)


class TestCids:
    def test_known_cids_mapped(self):
        assert substitute_cids("(cid:121) item") == "• item"
        assert substitute_cids("a(cid:150)b") == "a–b"
        assert substitute_cids("q(cid:146)s") == "q’s"

    def test_unknown_cid_stripped(self):
        assert substitute_cids("x (cid:999) y") == "x  y"

    def test_no_cid_passthrough(self):
        s = "plain text (cid without number)"
        assert substitute_cids(s) is s  # fast path returns same object


class TestHyphenation:
    def test_line_break_joined(self):
        assert repair_hyphenation("assem-\nblies") == "assemblies"

    def test_whitespace_around_break(self):
        assert repair_hyphenation("assem- \n  blies") == "assemblies"

    def test_mid_line_hyphen_kept(self):
        assert repair_hyphenation("well-known fact") == "well-known fact"


class TestFooters:
    def test_watermark_dropped_case_insensitive(self):
        lines = ["keep", "Downloaded from www.manualslib.com manuals search engine", "– CONTINUED –"]
        assert drop_footer_lines(lines) == ["keep"]


class TestNormalize:
    def test_blank_lines_removed_single_newline_join(self):
        # the load-bearing quirk: paragraph breaks do NOT survive normalize
        assert normalize_text("a\n\n\nb\n   \nc") == "a\nb\nc"

    def test_bullet_markers_unified(self):
        assert normalize_text("- one\n* two\n▶ three\no four") == "• one\n• two\n• three\n• four"

    def test_numbered_lists_untouched(self):
        assert normalize_text("1. first\n2) second") == "1. first\n2) second"

    def test_spaces_and_tabs_squeezed(self):
        assert normalize_text("a    b\tc") == "a b c"

    def test_hyphenation_repaired_wide(self):
        assert normalize_text("assem-\nblies work") == "assemblies work"

    def test_empty(self):
        assert normalize_text("") == ""
        assert normalize_text(None) == ""


class TestSanitize:
    def test_control_chars_removed_newline_tab_kept(self):
        # \t survives the control-strip but the whitespace squeeze folds it
        assert sanitize_text("a\x00b\x07c\x1fd") == "abcd"

    def test_newline_flood_capped(self):
        assert sanitize_text("a" + "\n" * 12 + "b") == "a\n\nb"
        # 9 newlines are BELOW the flood threshold and survive
        assert sanitize_text("a" + "\n" * 9 + "b") == "a" + "\n" * 9 + "b"

    def test_truncation_cap(self):
        out = sanitize_text("x" * 150_000)
        assert len(out) == 100_000
