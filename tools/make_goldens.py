"""Generate the checked-in golden corpus (FIXTURES.md §2).

Runs the pure-Python oracle over the seeded fixture conversations and writes
tests/goldens/{turns,chunks,docs}.json.  Regenerate ONLY when the contract
deliberately changes; the Spark pipeline must match these byte-for-byte.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.core.oracle import process_conversation  # noqa: E402
from pdf_extractor_spark.sources.transcripts import generate_conversation  # noqa: E402

GOLDEN_SEED = 42
GOLDEN_CONVS = 20
GOLDEN_SKEW_EVERY = 20  # conv-000019 gets ~35x the median turn count
OUT_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"


def build_goldens() -> dict[str, list[dict]]:
    turns, chunks, docs = [], [], []
    for i in range(GOLDEN_CONVS):
        conv_id = f"conv-{i:06d}"
        rows = [
            (turn_idx, text)
            for (_cid, turn_idx, _role, text, _tool, _ts) in generate_conversation(
                GOLDEN_SEED, i, skew_every=GOLDEN_SKEW_EVERY
            )
        ]
        result = process_conversation(conv_id, rows)
        turns.extend(result["turns"])
        chunks.extend(result["chunks"])
        docs.append(result["doc"])
    return {"turns": turns, "chunks": chunks, "docs": docs}


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    goldens = build_goldens()
    for name, rows in goldens.items():
        path = OUT_DIR / f"{name}.json"
        with path.open("w", encoding="utf-8") as f:
            json.dump(rows, f, ensure_ascii=False, sort_keys=True)
        print(f"{path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
