"""Stage 2 — per-conversation chunking via ``groupBy().applyInPandas``.

The overlap fold makes chunk *k+1* depend on chunk *k*
(/root/reference/api.py:1047-1070), so a conversation is the atomic unit of
work: whole conversations hash-shuffle to one task each
(``groupBy("conv_id")``), and conversations process in parallel across
tasks.  The group body is ``core.chunker.chunk_conversation`` — the golden
oracle's chunker — fed in turn_idx order (the W1 stable-ordering invariant,
api.py:964-968).

**Multiplexed output** (single-pass design): alongside its chunk rows every
conversation emits one *sentinel* row (``chunk_index = -1``) carrying the
document roll-up — status, title, num_turns, bytes_in, parse_failures.
This folds the reject gate (XSS ⇒ whole conversation yields zero chunks,
api.py:998-1002; > 10k turns ⇒ rejected, api.py:287), title inference
(api.py:769-844) and the lineage counters into the ONE shuffle the chunker
already needs — no second extraction pass, no second scan of the input, no
driver-side state.  plans/pipeline.py splits the two row kinds after the
atomic write.

Skew bound: a conversation contributes at most MAX_TURNS_PER_CONV turns
(longer ones are rejected inside the group fn before any fold work) and at
most MAX_CHUNKS_PER_CONV output chunks, so one group's memory is bounded
regardless of corpus skew.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..config import MAX_TURNS_PER_CONV
from ..core.chunker import TurnRecord, chunk_conversation
from ..core.oracle import STATUS_OK, STATUS_TOO_LONG, STATUS_XSS
from ..core.title import infer_title

MULTIPLEX_SCHEMA = (
    "conv_id string, chunk_index int, content string, turns array<int>, "
    "printed_pages array<string>, chapters array<string>, char_count int, "
    "start_turn int, end_turn int, "
    "status string, title string, num_turns int, bytes_in long, "
    "parse_failures int, struct_warnings int"
)

MULTIPLEX_COLS = [
    "conv_id", "chunk_index", "content", "turns", "printed_pages", "chapters",
    "char_count", "start_turn", "end_turn",
    "status", "title", "num_turns", "bytes_in", "parse_failures",
    "struct_warnings",
]

CHUNK_COLS = MULTIPLEX_COLS[:9]
DOC_COLS = ["conv_id", "title", "num_turns", "chunk_count", "status"]
SENTINEL_INDEX = -1


def _opt_str(v) -> Optional[str]:
    return v if isinstance(v, str) else None


def process_conversation_group(
    group: pd.DataFrame, *, max_turns: int = MAX_TURNS_PER_CONV
) -> pd.DataFrame:
    # max_turns is KEYWORD-ONLY: applyInPandas dispatches on the positional
    # arity of the group function (2 positionals → the (key, pdf) form), so a
    # second positional would silently change the calling convention
    """One conversation's extracted turns → chunk rows + sentinel doc row.

    Sorts by turn_idx HERE, inside the group body: neither batch
    ``applyInPandas`` nor ``applyInPandasWithState`` guarantees intra-group
    row order (shuffle readers interleave map outputs; the stateful path
    buffers in arrival order across micro-batches), and the overlap fold is
    order-dependent — this is the W1 stable-ordering invariant
    (reference sorts pages before chunking, api.py:964-968) enforced at the
    only place every code path funnels through.
    """
    group = group.sort_values("turn_idx", kind="stable").reset_index(drop=True)
    conv_id = group["conv_id"].iloc[0]
    n_turns = len(group)

    if n_turns > max_turns:
        status = STATUS_TOO_LONG
    elif bool(group["rejected_xss"].any()):
        status = STATUS_XSS
    else:
        status = STATUS_OK

    rows: list[dict] = []
    if status == STATUS_OK:
        records = [
            TurnRecord(
                int(t.turn_idx),
                t.clean_text or "",
                _opt_str(t.printed_page),
                _opt_str(t.chapter),
            )
            for t in group.itertuples(index=False)
        ]
        for c in chunk_conversation(records):
            rows.append({"conv_id": conv_id, **c})

    # Title precedence mirrors api.py:1314-1319: metadata title wins, the
    # first-turn inference is the fallback.  Transcript inputs carry no
    # metadata title by default (input_hint schema), so callers opt in by
    # providing a ``meta_title`` column; absent that, inference always runs
    # — the documented deviation from the reference's PDF-metadata path.
    meta_title = None
    if "meta_title" in group.columns:
        non_null = group["meta_title"].dropna()
        if len(non_null) and isinstance(non_null.iloc[0], str) and non_null.iloc[0].strip():
            meta_title = non_null.iloc[0].strip()

    # title from turn 0's pre-normalize extract (api.py:782-788 'page_1' path)
    first = group.loc[group["turn_idx"] == 0, "first_extract"]
    first_text = first.iloc[0] if len(first) and isinstance(first.iloc[0], str) else ""

    rows.append(
        {
            "conv_id": conv_id,
            "chunk_index": SENTINEL_INDEX,
            "status": status,
            "title": meta_title or infer_title(first_text),
            "num_turns": n_turns,
            "bytes_in": int(group["bytes_in"].sum()),
            "parse_failures": int((~group["parse_ok"].astype(bool)).sum()),
            # F3 warn-level structure flags: counted, never rejected
            "struct_warnings": int(group["struct_warn"].sum()),
        }
    )

    # every row carries every column: missing keys must be None (not NaN) so
    # Arrow maps them to nulls — NaN floats break array<int>/int32 conversion.
    # Columns are built TYPED directly: groups are small (tens of rows), so
    # the per-group fixed cost of building an object frame and re-astyping 8
    # columns dominated this function (~25% of stage-2 CPU, profiled) —
    # same dtypes, same nulls, one construction.
    _INT32 = ("chunk_index", "char_count", "start_turn", "end_turn",
              "num_turns", "parse_failures", "struct_warnings")
    data: dict[str, object] = {}
    for col in MULTIPLEX_COLS:
        vals = [r.get(col) for r in rows]
        if col in _INT32:
            data[col] = pd.array(vals, dtype="Int32")
        elif col == "bytes_in":
            data[col] = pd.array(vals, dtype="Int64")
        else:
            data[col] = vals
    return pd.DataFrame(data, columns=MULTIPLEX_COLS)


def chunk_conversations(extracted: DataFrame) -> DataFrame:
    """Extracted turns → multiplexed chunk+sentinel rows (one shuffle)."""
    cols = [
        "conv_id", "turn_idx", "clean_text", "printed_page", "chapter",
        "rejected_xss", "parse_ok", "struct_warn", "bytes_in", "first_extract",
    ]
    if "meta_title" in extracted.columns:  # optional metadata-title column
        cols.append("meta_title")
    pruned = extracted.select(*cols)
    return pruned.groupBy("conv_id").applyInPandas(
        process_conversation_group, schema=MULTIPLEX_SCHEMA
    )
