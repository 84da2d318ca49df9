"""Security screen, title inference, and HTML block-scoring tests."""

from pdf_extractor_spark.core.html_extract import (
    extract_html_main_content,
    looks_like_html,
    score_block,
)
from pdf_extractor_spark.core.security import (
    count_structure_warnings,
    is_dangerous,
    scan_dangerous,
)
from pdf_extractor_spark.core.title import infer_title


class TestSecurity:
    def test_script_tag(self):
        hit, why = scan_dangerous("before <script>alert(1)</script> after")
        assert hit and "script" in why.lower()

    def test_event_handler(self):
        assert is_dangerous('<img src=x onerror="pwn()">')

    def test_js_uri(self):
        assert is_dangerous("click javascript: void(0)")

    def test_pdf_actions(self):
        assert is_dangerous("/OpenAction (boom)")
        assert is_dangerous("/Launch (cmd.exe)")

    def test_benign_prose_clean(self):
        assert not is_dangerous("Torque the bolts to 25 Nm before installation.")

    def test_benign_html_clean(self):
        assert not is_dangerous("<p>hello</p><a href='/x'>link</a>")

    def test_case_insensitive(self):
        assert is_dangerous("<SCRIPT>x</SCRIPT>")

    def test_empty(self):
        assert not is_dangerous("")
        assert scan_dangerous("") == (False, None)


class TestStructureWarnings:
    """F3 parity (api.py:299-350): /JavaScript and /EmbeddedFiles NAMES are
    warn-level — counted, never rejected; the action-invocation forms stay
    reject-level."""

    def test_bare_names_warn_without_reject(self):
        text = "catalog has /JavaScript and /EmbeddedFiles entries"
        assert count_structure_warnings(text) == 2
        assert not is_dangerous(text)

    def test_single_warn(self):
        assert count_structure_warnings("/EmbeddedFiles dictionary") == 1
        assert count_structure_warnings("see /javascript name") == 1  # case-insensitive

    def test_action_form_still_rejects(self):
        text = "/JavaScript (app.alert(1))"
        assert is_dangerous(text)
        assert count_structure_warnings(text) == 1  # warned AND rejected

    def test_clean_text_no_warn(self):
        assert count_structure_warnings("plain prose, no pdf names") == 0
        assert count_structure_warnings("") == 0


class TestTitle:
    def test_combined_short_lines(self):
        text = "Off target\nContinued collective inaction\nEmissions Gap Report 2025\nlong body text follows here"
        t = infer_title(text)
        assert t == "Off target Continued collective inaction Emissions Gap Report 2025"

    def test_skips_page_numbers_and_short_lines(self):
        text = "42\nab\nReal Document Title\nbody content continues here with more words"
        assert infer_title(text).startswith("Real Document Title")

    def test_fallback_first_long_line(self):
        text = "x" * 150 + " " + "y" * 149  # single 300-char line: no candidate
        assert infer_title(text) == text  # fallback: first >10-char line

    def test_empty(self):
        assert infer_title("") == ""
        assert infer_title("  \n ") == ""


class TestHtml:
    def test_dispatch(self):
        assert looks_like_html("<html><body><p>x</p></body></html>")
        assert looks_like_html("<div>a</div> <p>b</p>")
        assert not looks_like_html("plain text with a < b comparison")
        assert not looks_like_html("ENGINE 7-5\nplain page text")

    def test_boilerplate_stripped(self):
        html = (
            "<html><body>"
            "<nav><a href='/a'>AAA</a><a href='/b'>BBB</a></nav>"
            "<div><p>" + "Main content sentence goes here. " * 8 + "</p></div>"
            "<footer><a href='/tos'>terms of service</a></footer>"
            "</body></html>"
        )
        out = extract_html_main_content(html)
        assert "Main content sentence" in out
        assert "AAA" not in out and "terms of service" not in out

    def test_link_farm_dropped(self):
        block = "<p>" + "".join(f"<a href='/{i}'>link {i} here</a> " for i in range(20)) + "</p>"
        out = extract_html_main_content("<div>" + block + "</div>")
        assert out == ""

    def test_heading_kept(self):
        out = extract_html_main_content("<h1>Guide</h1><p>" + "content words here now. " * 5 + "</p>")
        assert out.startswith("Guide\n\n")

    def test_score_block_tiers(self):
        assert score_block("x" * 30, 0, False)            # dense text, no links
        assert not score_block("x" * 10, 0, False)        # too short
        assert score_block("x" * 90, 30, False)           # mid link-density, long enough
        assert not score_block("x" * 90, 80, False)       # link farm
        assert score_block("Hey", 0, True)                # heading
        assert not score_block("ab", 0, True)

    def test_malformed_never_raises(self):
        assert isinstance(extract_html_main_content("<div><p>unclosed " * 50), str)
