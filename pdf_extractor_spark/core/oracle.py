"""Single-process reference pipeline — golden generator AND UDF body.

This module chains the core transforms exactly the way the reference wires
them (/root/reference/api.py:1940-2017 → api.py:948-1111):

    layout/HTML extract → normalize → sanitize → XSS gate → units → chunks
                                                          ↘ title (turn 0)

It is imported by the pytest golden generator and by the pandas UDFs in
``operators/`` — one implementation exercised two ways, mirroring how the
reference's ``inspect.py:92-128`` borrows ``api.py``'s chunker for dry runs.
Keeping both callers on the same byte-level code is what makes the Spark
output equal to the goldens by construction.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from ..config import MAX_FILE_SIZE, MAX_TURNS_PER_CONV, MIN_FILE_SIZE
from .chunker import TurnRecord, chunk_conversation
from .html_extract import extract_html_main_content, looks_like_html
from .layout import extract_turn
from .security import count_structure_warnings, is_dangerous
from .textnorm import normalize_text, sanitize_text
from .title import infer_title

STATUS_OK = "embedded"
STATUS_XSS = "failed(xss)"
STATUS_TOO_LONG = "failed(too_many_turns)"


def extract_turn_fields(raw: Optional[str]) -> dict[str, Any]:
    """Stage-1 per-turn transform → the golden_turns column set.

    ``parse_ok`` is the analog of the reference's file validation
    (api.py:247-296: magic bytes + 100 B ≤ size ≤ 200 MB); ``rejected_xss``
    is the two-layer scan — raw payload (binary-scan analog, api.py:456-472)
    plus sanitized text (api.py:998-1002).
    """
    raw = raw or ""
    parse_ok = MIN_FILE_SIZE <= len(raw) <= MAX_FILE_SIZE

    if looks_like_html(raw):
        extracted = extract_html_main_content(raw)
        printed_page: Optional[str] = None
        chapter: Optional[str] = None
    else:
        extracted, printed_page, chapter = extract_turn(raw)

    clean = sanitize_text(normalize_text(extracted))
    flagged = is_dangerous(raw) or is_dangerous(clean)

    return {
        "extracted_text": extracted,  # pre-normalize; feeds title inference
        "clean_text": clean,
        "printed_page": printed_page,
        "chapter": chapter,
        "char_count": len(clean),
        "parse_ok": parse_ok,
        "rejected_xss": flagged,
        # F3 warn-level flags (api.py:299-350): logged/counted, never reject
        "struct_warn": count_structure_warnings(raw),
    }


def process_conversation(
    conv_id: str, turns: Iterable[tuple[int, Optional[str]]]
) -> dict[str, Any]:
    """Full oracle run for one conversation.

    Returns {"turns": [...], "chunks": [...], "doc": {...}} where the rows
    match the golden_turns / golden_chunks / golden_doc_meta schemas in
    FIXTURES.md.  A rejected conversation (XSS hit anywhere, or more than
    MAX_TURNS_PER_CONV turns — the reference's 10k-page cap) yields zero
    chunk rows and a failed doc row (api.py:998-1002, api.py:287-293).
    """
    ordered = sorted(turns, key=lambda t: t[0])

    turn_rows = []
    records = []
    any_xss = False
    for turn_idx, raw in ordered:
        fields = extract_turn_fields(raw)
        any_xss = any_xss or fields["rejected_xss"]
        turn_rows.append({"conv_id": conv_id, "turn_idx": turn_idx, **fields})
        records.append(
            TurnRecord(
                turn_idx, fields["clean_text"], fields["printed_page"], fields["chapter"]
            )
        )

    if len(ordered) > MAX_TURNS_PER_CONV:
        status = STATUS_TOO_LONG
    elif any_xss:
        status = STATUS_XSS
    else:
        status = STATUS_OK

    chunks = []
    if status == STATUS_OK:
        for c in chunk_conversation(records):
            chunks.append({"conv_id": conv_id, **c})

    first_extracted = turn_rows[0]["extracted_text"] if turn_rows else ""
    doc = {
        "conv_id": conv_id,
        "title": infer_title(first_extracted),
        "num_turns": len(turn_rows),
        "chunk_count": len(chunks),
        "status": status,
    }

    # golden_turns excludes the intermediate extracted_text column
    for row in turn_rows:
        row.pop("extracted_text")

    return {"turns": turn_rows, "chunks": chunks, "doc": doc}
