#!/usr/bin/env python
"""Dry-run inspector — the analog of the reference's ``inspect.py``.

The reference ships a no-DB/no-API inspector that runs the extraction +
chunking pipeline on one document and prints exactly what would land in the
chunks table, plus plausibility checks (/root/reference/inspect.py:48-196,
168-194, 201-225).  This tool does the same for one synthetic conversation
(or stdin text): per-turn extraction report, chunk report with lineage, and
the invariant checks the reference eyeballs, made explicit.

Usage:
    python tools/inspect_conv.py --conv 3 [--seed 42] [--json]
    echo "some text" | python tools/inspect_conv.py --stdin
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extractor_spark.config import CHUNK_SIZE  # noqa: E402
from pdf_extractor_spark.core.oracle import process_conversation  # noqa: E402
from pdf_extractor_spark.sources.transcripts import generate_conversation  # noqa: E402


def _plausibility(out: dict) -> list[str]:
    """The reference's inspect.py:168-194 checks as explicit findings."""
    findings = []
    for t in out["turns"]:
        pp = t["printed_page"]
        if pp and pp.isdigit() and 1800 <= int(pp) <= 2099:
            findings.append(
                f"turn {t['turn_idx']}: printed_page {pp!r} looks like a year"
            )
    for c in out["chunks"]:
        if c["char_count"] > CHUNK_SIZE * 2:
            findings.append(
                f"chunk {c['chunk_index']}: char_count {c['char_count']} "
                f"> 2x chunk size"
            )
    idxs = [c["chunk_index"] for c in out["chunks"]]
    if idxs != list(range(len(idxs))):
        findings.append(f"chunk_index not dense: {idxs[:10]}...")
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv", type=int, default=0, help="conversation index")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--stdin", action="store_true", help="treat stdin as one turn")
    ap.add_argument("--json", action="store_true", dest="as_json")
    args = ap.parse_args()

    if args.stdin:
        turns = [(0, sys.stdin.read())]
        conv_id = "stdin-000000"
    else:
        rows = list(generate_conversation(args.seed, args.conv, skew_every=20))
        turns = [(r[1], r[3]) for r in rows]
        conv_id = rows[0][0]

    out = process_conversation(conv_id, turns)
    findings = _plausibility(out)

    if args.as_json:
        print(json.dumps({**out, "findings": findings}, indent=2, default=str))
        return 0

    doc = out["doc"]
    print(f"== {conv_id}: {doc['status']}  turns={doc['num_turns']} "
          f"chunks={doc['chunk_count']}  title={doc['title']!r}")
    print("-- turns --")
    for t in out["turns"]:
        head = (t["clean_text"] or "").replace("\n", "\\n")[:70]
        print(f"  [{t['turn_idx']:>4}] pp={t['printed_page'] or '-':<8} "
              f"ch={(t['chapter'] or '-')[:18]:<18} {t['char_count']:>6}ch "
              f"{'XSS!' if t['rejected_xss'] else ''} {head}")
    print("-- chunks --")
    for c in out["chunks"]:
        head = c["content"].replace("\n", "\\n")[:70]
        print(f"  [{c['chunk_index']:>4}] turns={c['start_turn']}-{c['end_turn']} "
              f"{c['char_count']:>5}ch {head}")
    print("-- plausibility --")
    for f in findings or ["all checks pass"]:
        print(f"  {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
