"""Title inference from a conversation's first turn.

Parity contract: /root/reference/api.py:769-844
(``_infer_title_from_first_page``): scan the first 10 non-empty lines of the
first page's *layout-extracted* (pre-normalize) text; 5-100-char lines are
title candidates (100-200-char lines qualify within the first 5); two or
more candidates combine (up to 3, if ≤ 200 chars total); with no candidate,
fall back to the first >10-char line among the first 5.
"""

from __future__ import annotations

import re

_ONLY_DIGITS = re.compile(r"^\d+$")
_PAGE_LABEL = re.compile(r"^page\s+\d+", re.IGNORECASE)


def infer_title(first_turn_text: str) -> str:
    """Best-effort document title from the first turn's extracted text."""
    if not first_turn_text or not first_turn_text.strip():
        return ""

    lines = [ln.strip() for ln in first_turn_text.split("\n") if ln.strip()]
    if not lines:
        return ""

    candidates: list[str] = []
    for i, line in enumerate(lines[:10]):
        if len(line) < 5:
            continue
        if _ONLY_DIGITS.match(line) or _PAGE_LABEL.match(line):
            continue
        if len(line) <= 100:
            candidates.append(line)
        elif len(line) <= 200 and i < 5:
            candidates.append(line)

    if not candidates:
        for line in lines[:5]:
            if len(line) > 10:
                return line
        return ""

    if len(candidates) >= 2:
        combined = " ".join(candidates[:3])
        if len(combined) <= 200:
            return combined

    return candidates[0]
