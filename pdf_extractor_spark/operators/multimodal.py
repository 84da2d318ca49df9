"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Image/audio/video payloads ride through the engine as opaque binary columns
plus a typed metadata struct — the same pattern the reference uses for its
non-text artifacts (first-page JPG thumbnail sidecar, /root/reference/
api.py:607-717): bytes are never interpreted by the relational layer, only
by explicitly-invoked decode operators.

The Spark-side plumbing here is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` 1→N fan-out, partition behavior.  The *actual*
media decoding is stubbed: this container has no image/audio libraries, so
``decode_media_meta`` derives deterministic pseudo-metadata from the bytes
(digest-seeded), and ``resize_image``/``decode_audio`` raise
``NotImplementedError`` unless PIL/soundfile are importable.  On a real
cluster only `_real_*` below changes; every schema and operator contract
stays identical.

Scale notes: blobs stay in Arrow binary buffers end-to-end (no base64
round-trips); decode runs ``mapInPandas`` so one task streams batches
instead of materialising a partition; frame fan-out multiplies rows, so
callers should budget ``spark.sql.files.maxPartitionBytes`` /
``maxRecordsPerBatch`` for the *output* row count, not the input.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 4096  # fake fixed-size "frame" for the sampler

META_SCHEMA = (
    "doc_id long, n_bytes int, media_type string, width int, height int, "
    "digest16 string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset int, frame binary"


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in payload: the utf-8 bytes of ``text_col``.

    In production this column comes from the lake (parquet BINARY /
    Iceberg ``binary``); synthesising it from text keeps tests and DuckDB
    oracles byte-identical (``encode(text)`` both engines).
    """
    return df.withColumn("blob", F.encode(F.col(text_col), "UTF-8"))


def _pseudo_meta(blob: bytes) -> tuple[str, int, int, str]:
    """Deterministic fake decode: digest-seeded type/dimensions.

    REAL DECODE GOES HERE on a cluster with media libs; see resize_image
    for the gated pattern.
    """
    d = hashlib.md5(blob).hexdigest()
    seed = int(d[:8], 16)
    media_type = ("image/png", "image/jpeg", "audio/wav", "video/mp4")[seed % 4]
    width = 160 + (seed % 1600)
    height = 90 + (seed // 7 % 900)
    return media_type, width, height, d[:16]


def decode_media_meta(df: DataFrame) -> DataFrame:
    """(doc_id, blob) → typed metadata rows via mapInPandas.

    Arrow streams binary batches into Python; nothing is collected, one
    output row per input row, schema fixed up front.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_pseudo_meta(b if b is not None else b"") for b in pdf["blob"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["blob"]],
                    "media_type": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "digest16": [m[3] for m in metas],
                }
            )
            out["n_bytes"] = out["n_bytes"].astype("int32")
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return df.select("doc_id", "blob").mapInPandas(gen, META_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame sampler: each blob fans out to ceil(n/frame_bytes) frame rows
    (doc_id, frame_idx, frame_offset, frame) — the 1→N mapInPandas shape a
    real video frame-extractor uses (ffmpeg keyframe pull on a cluster)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = blob if blob is not None else b""
                for k in range(0, max(len(blob), 1), frame_bytes):
                    ids.append(doc_id)
                    idxs.append(k // frame_bytes)
                    offs.append(k)
                    frames.append(bytes(blob[k : k + frame_bytes]))
            out = pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_offset": offs,
                 "frame": frames}
            )
            out["doc_id"] = out["doc_id"].astype("int64")
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["frame_offset"] = out["frame_offset"].astype("int32")
            yield out

    return df.select("doc_id", "blob").mapInPandas(gen, FRAME_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize — gated on PIL, absent in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in sandbox
        raise NotImplementedError(
            "resize_image needs Pillow; this container has no media libs. "
            "The Spark plumbing contract is decode_media_meta/sample_frames."
        ) from exc
    raise NotImplementedError("real decode path not exercised in sandbox")


def decode_audio(df: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Real audio decode — gated on soundfile, absent in this container."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no soundfile in sandbox
        raise NotImplementedError(
            "decode_audio needs soundfile; this container has no media libs."
        ) from exc
    raise NotImplementedError("real decode path not exercised in sandbox")
