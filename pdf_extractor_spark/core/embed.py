"""Deterministic embedding stub.

The reference calls OpenAI ``text-embedding-3-small`` in batches of 200 with
all-or-nothing retry semantics (/root/reference/api.py:1129-1214) and stores
1536-d vectors (DB_ST_2.md:80-86).  No external services exist in this
sandbox, so the vector itself is a deterministic SHAKE-256 expansion of the
chunk text: same text → same vector, unit-norm, fixed dimension.  The
*contract* that matters — embeddings computed before the single atomic sink
append so no chunk row ever lands without its vector (api.py:1360-1380) — is
preserved in plans/pipeline.py.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..config import EMBED_DIM


def embed_text(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Unit-norm float32 vector derived only from the text bytes."""
    stream = hashlib.shake_256(text.encode("utf-8")).digest(dim * 4)
    raw = np.frombuffer(stream, dtype="<u4").astype(np.float64)
    # map uint32 → (-1, 1), then L2-normalise
    vec = raw / 2147483647.5 - 1.0
    norm = float(np.linalg.norm(vec))
    if norm == 0.0:
        vec = np.full(dim, 1.0 / np.sqrt(dim))
        norm = 1.0
    return (vec / norm).astype(np.float32)


def embed_batch(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Vectorised helper for Arrow batches: (len(texts), dim) float32."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = embed_text(t or "", dim)
    return out
