"""Text cleanup: CID repair, hyphenation, footer stripping, normalize, sanitize.

Behavioural contract comes from the reference implementation
(pmwangi5/pdf-extractor):

* CID substitution map + unknown-CID strip ... /root/reference/pdf_extractor.py:24-53
* hyphenation repair                        ... /root/reference/pdf_extractor.py:56-58
* footer watermark line removal             ... /root/reference/pdf_extractor.py:41-44,61-63
* ``normalize_text``                        ... /root/reference/api.py:720-766
* ``sanitize_text``                         ... /root/reference/api.py:353-381

Everything in this module is pure Python + ``re`` — NOT Spark SQL regex —
because Java and Python regex semantics diverge (``\\w`` under Unicode,
lookbehind) and the golden contract is byte-for-byte equality.  These
functions run vectorised over Arrow batches inside pandas UDFs; a native
Spark SQL approximation for QA/metrics lives in ``functions/native.py``.
"""

from __future__ import annotations

import re

from ..config import MAX_TEXT_LENGTH

# Unicode equivalents for the (cid:NNN) artifacts the reference knows about
# (pdf_extractor.py:24-35).  Unknown codes are deleted outright.
CID_SUBSTITUTIONS: dict[str, str] = {
    "(cid:121)": "•",   # bullet
    "(cid:132)": "■",   # filled square
    "(cid:84)": "™",    # trademark
    "(cid:146)": "’",   # apostrophe
    "(cid:147)": "“",   # left double quote
    "(cid:148)": "”",   # right double quote
    "(cid:150)": "–",   # en dash
    "(cid:151)": "—",   # em dash
    "(cid:160)": " ",        # nbsp
    "(cid:183)": "·",   # middle dot
}

_ANY_CID = re.compile(r"\(cid:\d+\)")

# Watermark/continuation footer lines, matched case-insensitively after strip
# (pdf_extractor.py:41-44).
FOOTER_LINE_SET = frozenset(
    {
        "downloaded from www.manualslib.com manuals search engine",
        "– continued –",
    }
)

_HYPHEN_BREAK = re.compile(r"(\w)-\s*\n\s*(\w)")
_HYPHEN_BREAK_WIDE = re.compile(r"(\w+)-\s*\n\s*(\w+)")
_MULTI_NEWLINE3 = re.compile(r"\n{3,}")
_BULLET_MARKER = re.compile(r"^\s*[-*•o▶►]\s+", re.MULTILINE)
_TWO_PLUS_SPACES = re.compile(r"  +")
_SPACE_TAB_RUN = re.compile(r"[ \t]+")
_MULTI_NEWLINE2 = re.compile(r"\n\n+")
_CONTROL_CHARS = re.compile(r"[\x00-\x08\x0B-\x0C\x0E-\x1F\x7F]")
_NEWLINE_FLOOD = re.compile(r"\n{10,}")


def substitute_cids(text: str) -> str:
    """Map known ``(cid:NNN)`` artifacts to Unicode; drop unknown ones.

    Parity: pdf_extractor.py:47-53.
    """
    if "(cid:" not in text:  # hot path: header tokens rarely carry CIDs
        return text
    for needle, repl in CID_SUBSTITUTIONS.items():
        if needle in text:
            text = text.replace(needle, repl)
    return _ANY_CID.sub("", text)


def repair_hyphenation(text: str) -> str:
    """Rejoin words split across a line break by a trailing hyphen.

    Parity: pdf_extractor.py:56-58 (single-char capture variant used at the
    layout stage; the wider variant runs again inside ``normalize_text``).
    """
    return _HYPHEN_BREAK.sub(r"\1\2", text)


def drop_footer_lines(lines: list[str]) -> list[str]:
    """Remove ManualsLib watermark / '– continued –' lines.

    Parity: pdf_extractor.py:61-63.
    """
    return [ln for ln in lines if ln.strip().lower() not in FOOTER_LINE_SET]


def normalize_text(text: str) -> str:
    """Collapse PDF layout whitespace while keeping reading structure.

    Parity: api.py:720-766.  Note the first pass drops *every* blank line and
    rejoins with single newlines, so normalized output contains no paragraph
    breaks — downstream unit splitting therefore sees one paragraph per turn
    unless the turn itself is header/list shaped.  That quirk is load-bearing
    for chunk-span parity and is preserved deliberately.
    """
    if not text:
        return ""

    kept = [ln.strip() for ln in text.split("\n")]
    text = "\n".join(ln for ln in kept if ln)

    text = _MULTI_NEWLINE3.sub("\n\n", text)
    text = _HYPHEN_BREAK_WIDE.sub(r"\1\2", text)
    text = _BULLET_MARKER.sub("• ", text)
    # numbered-list markers are intentionally left untouched (api.py:756)
    text = _TWO_PLUS_SPACES.sub(" ", text)
    text = _SPACE_TAB_RUN.sub(" ", text)
    text = _MULTI_NEWLINE2.sub("\n\n", text)
    return text.strip()


def sanitize_text(text: str) -> str:
    """Strip NULs/control chars, cap length, squeeze residual whitespace.

    Parity: api.py:353-381 (``sanitize_text_for_embeddings``).
    """
    if not text:
        return ""
    text = text.replace("\x00", "")
    text = _CONTROL_CHARS.sub("", text)
    if len(text) > MAX_TEXT_LENGTH:
        text = text[:MAX_TEXT_LENGTH]
    text = _SPACE_TAB_RUN.sub(" ", text)
    text = _NEWLINE_FLOOD.sub("\n\n", text)
    return text.strip()
