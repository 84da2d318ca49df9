"""Semantic unit splitting — block classification by shape/length heuristics.

Parity contract: /root/reference/api.py:847-945
(``_split_into_semantic_units``).  Classification order per paragraph:

1. header-shaped blocks (< 100 chars AND all-caps / Title Case / numbered
   section label) stay standalone units;
2. bullet lists (block *starts with* '• ') stay whole ≤ 1500 chars, else
   split per bullet;
3. numbered lists (block starts with 'N.' / 'N)') — same rule, own splitter;
4. paragraphs > 1200 chars are sentence-split and repacked to ≤ 900 chars;
5. anything else is one unit.

Note: normalize_text() upstream removes blank lines inside a turn, so in
practice each turn arrives as a single paragraph unless it is itself
header/list shaped — same behaviour as the reference chain.
"""

from __future__ import annotations

import re

from ..config import (
    HEADER_MAX_CHARS,
    LIST_SPLIT_CHARS,
    PARA_SPLIT_CHARS,
    SENTENCE_PACK_CHARS,
)

_PARA_BREAK = re.compile(r"\n{2,}")
_SECTION_LABEL = re.compile(r"^(Chapter|Section|Box|Figure|Table)\s+\d+", re.IGNORECASE)
_BULLET_HEAD = re.compile(r"^•\s+")
_NUMBERED_HEAD = re.compile(r"^\d+[.)]\s+")
_BULLET_SPLIT = re.compile(r"\n(?=•\s+)")
_NUMBERED_SPLIT = re.compile(r"\n(?=\d+[.)]\s+)")
_SENTENCE_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z])")


def _is_header_block(para: str) -> bool:
    return len(para) < HEADER_MAX_CHARS and (
        para.isupper() or para.istitle() or bool(_SECTION_LABEL.match(para))
    )


def _repack_sentences(para: str) -> list[str]:
    """Sentence-split an overlong paragraph, re-packing to ≤ 900 chars.

    Parity: api.py:915-940 (the +1 separator accounting and the
    carry-forward of the final partial unit).
    """
    out: list[str] = []
    acc = ""
    for sentence in _SENTENCE_BOUNDARY.split(para):
        sentence = sentence.strip()
        if not sentence:
            continue
        if acc and len(acc) + len(sentence) + 1 > SENTENCE_PACK_CHARS:
            out.append(acc.strip())
            acc = sentence
        else:
            acc = f"{acc} {sentence}" if acc else sentence
    if acc.strip():
        out.append(acc.strip())
    return out


def split_semantic_units(text: str) -> list[str]:
    """Split normalized text into semantic units (see module docstring)."""
    if not text:
        return []

    units: list[str] = []
    for para in _PARA_BREAK.split(text):
        para = para.strip()
        if not para:
            continue

        if _is_header_block(para):
            units.append(para)
        elif _BULLET_HEAD.match(para):
            if len(para) > LIST_SPLIT_CHARS:
                units.extend(b for b in (s.strip() for s in _BULLET_SPLIT.split(para)) if b)
            else:
                units.append(para)
        elif _NUMBERED_HEAD.match(para):
            if len(para) > LIST_SPLIT_CHARS:
                units.extend(it for it in (s.strip() for s in _NUMBERED_SPLIT.split(para)) if it)
            else:
                units.append(para)
        elif len(para) > PARA_SPLIT_CHARS:
            units.extend(_repack_sentences(para))
        else:
            units.append(para)

    return units
