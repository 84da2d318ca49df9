"""Chunk accumulation with sentence-aligned overlap — the stateful core.

Parity contract: /root/reference/api.py:948-1111
(``_chunk_text_for_embeddings``).  Chunk *k+1* depends on chunk *k* through
the overlap carry, so a conversation can never be split mid-stream: the
Spark plan runs this fold once per conversation inside
``groupBy(conv_id).applyInPandas`` (operators/chunk.py), while this module
stays Spark-free so the identical byte-level logic also generates goldens.

Quirks preserved on purpose (they are part of the golden contract):

* ``char_count`` measures the *unstripped* accumulator while ``content`` is
  the stripped text (api.py:1036,1040);
* after an overlap carry the turn-set restarts as ``{max(previous turns)}``
  before adding the new unit's turn — the Dec-2025 page-tracking fix
  (api.py:1072-1075, reference README.md:71-95);
* printed-page sets sort with ``key=str`` (api.py:1038);
* the 40 % tail fallback when no sentence/paragraph boundary exists in the
  overlap window (api.py:1065).

Input units must already be normalize→sanitize clean (Stage 1 output).
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Optional

from ..config import CHUNK_OVERLAP, CHUNK_SIZE, MAX_CHUNKS_PER_CONV
from .units import split_semantic_units

_SENT_GAP = re.compile(r"(?<=[.!?])\s+")
_PARA_GAP = re.compile(r"\n\n")


class TurnRecord:
    """One extracted turn entering the chunker (Stage-1 output row)."""

    __slots__ = ("turn_idx", "clean_text", "printed_page", "chapter")

    def __init__(
        self,
        turn_idx: int,
        clean_text: str,
        printed_page: Optional[str] = None,
        chapter: Optional[str] = None,
    ) -> None:
        self.turn_idx = turn_idx
        self.clean_text = clean_text or ""
        self.printed_page = printed_page
        self.chapter = chapter


def _trim_overlap(window: str) -> str:
    """Trim the raw overlap window to the last sentence boundary, else the
    last paragraph break, else drop the leading 40 %.  Parity: api.py:1047-1070.
    """
    last = None
    for m in _SENT_GAP.finditer(window):
        last = m
    if last is not None:
        return window[last.end():]
    last = None
    for m in _PARA_GAP.finditer(window):
        last = m
    if last is not None:
        return window[last.end():]
    return window[int(len(window) * 0.4):]


def chunk_conversation(
    turns: Iterable[TurnRecord],
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    max_chunks: int = MAX_CHUNKS_PER_CONV,
) -> list[dict[str, Any]]:
    """Fold a conversation's turns into overlapping chunks.

    Returns dicts with keys: chunk_index, content, turns, printed_pages,
    chapters, char_count, start_turn, end_turn.
    """
    ordered = sorted(turns, key=lambda t: t.turn_idx)

    # Pass 1: explode turns into semantic units, each tagged with lineage.
    flat_units: list[tuple[str, int, Optional[str], Optional[str]]] = []
    for t in ordered:
        if not t.clean_text.strip():
            continue
        for unit in split_semantic_units(t.clean_text):
            flat_units.append((unit, t.turn_idx, t.printed_page, t.chapter))

    # Pass 2: sequential accumulation with overlap carry.
    chunks: list[dict[str, Any]] = []
    acc = ""
    acc_turns: set[int] = set()
    acc_printed: set[str] = set()
    acc_chapters: set[str] = set()
    next_index = 0

    def _emit() -> None:
        nonlocal next_index
        if not acc.strip():
            return
        chunks.append(
            {
                "chunk_index": next_index,
                "content": acc.strip(),
                "turns": sorted(acc_turns),
                "printed_pages": sorted((p for p in acc_printed if p), key=str),
                "chapters": sorted(c for c in acc_chapters if c),
                "char_count": len(acc),
                "start_turn": min(acc_turns) if acc_turns else 0,
                "end_turn": max(acc_turns) if acc_turns else 0,
            }
        )
        next_index += 1

    for unit, turn_idx, printed, chapter in flat_units:
        joined_len = len(acc) + (len(unit) + 2 if acc else len(unit))

        if acc and joined_len > chunk_size:
            _emit()
            if overlap > 0:
                carry = _trim_overlap(acc[-overlap:].strip())
                acc = f"{carry}\n\n{unit}" if carry else unit
                acc_turns = {max(acc_turns)} if acc_turns else {turn_idx}
                acc_turns.add(turn_idx)
                acc_printed = {printed} if printed else set()
                acc_chapters = {chapter} if chapter else set()
            else:
                acc = unit
                acc_turns = {turn_idx}
                acc_printed = {printed} if printed else set()
                acc_chapters = {chapter} if chapter else set()
        else:
            acc = f"{acc}\n\n{unit}" if acc else unit
            acc_turns.add(turn_idx)
            if printed:
                acc_printed.add(printed)
            if chapter:
                acc_chapters.add(chapter)

    _emit()  # trailing partial chunk (api.py:1094-1104)

    return chunks[:max_chunks]
