"""Regenerate the pipeline golden parquet files used as DuckDB oracles.

The four pipeline catalog queries (extract_turns_pipeline, chunk_pipeline,
documents_pipeline, tables_pipeline) run pandas-UDF logic DuckDB cannot
express in SQL, so their oracles are *committed golden parquet* computed by
the single-process pure-Python oracle path (core/oracle.py — the same
inspector pattern the reference uses, /root/reference/inspect.py:92-128):
the driver's DuckDB side does `SELECT ... FROM read_parquet(golden)` while
the Spark side runs the real distributed pipeline, verifying the Arrow
round-trip, grouping, ordering and multiplex/split plumbing end to end.

The pipeline queries generate their own deterministic input
(transcripts seed=42, 40 convs, skew_every=20 — independent of sf_dir),
so one golden is valid at every scale factor.

Run:  python tools/gen_pipeline_goldens.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extractor_spark.core.html_extract import (  # noqa: E402
    extract_html_main_content,
    looks_like_html,
)
from pdf_extractor_spark.core.oracle import process_conversation  # noqa: E402
from pdf_extractor_spark.core.tables import detect_tables  # noqa: E402
from pdf_extractor_spark.sources.transcripts import (  # noqa: E402
    generate_conversation,
)

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "pipeline",
)

N_CONVS = 40      # = queries._PIPELINE_CONVS
SEED = 42
SKEW_EVERY = 20


def build_goldens() -> dict[str, pd.DataFrame]:
    turn_rows, chunk_rows, doc_rows, table_rows = [], [], [], []
    html_rows = []

    for conv_i in range(N_CONVS):
        raw = list(generate_conversation(SEED, conv_i, skew_every=SKEW_EVERY))
        conv_id = raw[0][0]
        result = process_conversation(conv_id, [(r[1], r[3]) for r in raw])

        for r, (_cid, _tidx, _role, text, _tool, _ts) in zip(result["turns"], raw):
            turn_rows.append({**r, "bytes_in": len(text)})
            tables = detect_tables(text)
            table_rows.append({
                "conv_id": conv_id,
                "turn_idx": r["turn_idx"],
                "num_tables": len(tables),
                "table_rows": sum(len(t) for t in tables),
                "table_cells": sum(len(row) for t in tables for row in t),
            })
            h = looks_like_html(text)
            html_rows.append({
                "conv_id": conv_id,
                "turn_idx": r["turn_idx"],
                "is_html": h,
                "raw_len": len(text),
                "main_len": len(extract_html_main_content(text)) if h else None,
            })

        for c in result["chunks"]:
            chunk_rows.append({
                "conv_id": c["conv_id"],
                "chunk_index": c["chunk_index"],
                "content": c["content"],
                "turns_csv": ",".join(str(t) for t in c["turns"]),
                "printed_pages_csv": ",".join(c["printed_pages"]),
                "chapters_csv": ",".join(c["chapters"]),
                "char_count": c["char_count"],
                "start_turn": c["start_turn"],
                "end_turn": c["end_turn"],
            })

        doc_rows.append(result["doc"])

    turns = pd.DataFrame(turn_rows, columns=[
        "conv_id", "turn_idx", "clean_text", "printed_page", "chapter",
        "char_count", "parse_ok", "rejected_xss", "struct_warn", "bytes_in",
    ])
    for col in ("turn_idx", "char_count", "struct_warn"):
        turns[col] = turns[col].astype("int32")
    turns["bytes_in"] = turns["bytes_in"].astype("int64")

    chunks = pd.DataFrame(chunk_rows)
    for col in ("chunk_index", "char_count", "start_turn", "end_turn"):
        chunks[col] = chunks[col].astype("int32")

    docs = pd.DataFrame(doc_rows, columns=[
        "conv_id", "title", "num_turns", "chunk_count", "status",
    ])
    for col in ("num_turns", "chunk_count"):
        docs[col] = docs[col].astype("int32")

    tables = pd.DataFrame(table_rows)
    for col in ("turn_idx", "num_tables", "table_rows", "table_cells"):
        tables[col] = tables[col].astype("int32")

    html = pd.DataFrame(
        html_rows, columns=["conv_id", "turn_idx", "is_html", "raw_len", "main_len"]
    )
    for col in ("turn_idx", "raw_len"):
        html[col] = html[col].astype("int32")
    html["main_len"] = html["main_len"].astype("Int32")

    return {
        "extract_turns": turns,
        "chunks": chunks,
        "documents": docs,
        "tables": tables,
        "html_stats": html,
    }


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, df in build_goldens().items():
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"wrote {path}: {len(df)} rows, {list(df.columns)}")


if __name__ == "__main__":
    main()
