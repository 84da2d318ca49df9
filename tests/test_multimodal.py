"""Multimodal binary-column plumbing: schemas, fan-out shape, stub gates.

The decode body is a deterministic stub (no media libs in this container);
what these tests pin is the Spark-side contract — binary columns through
Arrow, mapInPandas 1→N fan-out, byte conservation, null handling — which is
exactly what survives unchanged when a real decoder replaces the stub.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from pdf_extractor_spark.operators.multimodal import (
    FRAME_BYTES,
    _pseudo_meta,
    attach_blob,
    decode_media_meta,
    resize_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "short text"),
        (2, "x" * (FRAME_BYTES + 17)),          # 2 frames
        (3, "y" * (3 * FRAME_BYTES)),           # exactly 3 frames
        (4, "unicode bytes: 日本語 ±0.5 Ω"),      # multi-byte utf-8
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_attach_blob_is_binary_utf8(docs):
    out = attach_blob(docs)
    assert isinstance(out.schema["blob"].dataType, BinaryType)
    got = {r["doc_id"]: bytes(r["blob"]) for r in out.collect()}
    assert got[4] == "unicode bytes: 日本語 ±0.5 Ω".encode("utf-8")


def test_decode_media_meta_matches_local_stub(docs):
    got = {r["doc_id"]: r.asDict() for r in decode_media_meta(attach_blob(docs)).collect()}
    for r in docs.collect():
        blob = r["text"].encode("utf-8")
        media_type, width, height, digest16 = _pseudo_meta(blob)
        row = got[r["doc_id"]]
        assert row["n_bytes"] == len(blob)
        assert (row["media_type"], row["width"], row["height"]) == (
            media_type, width, height,
        )
        assert row["digest16"] == digest16


def test_sample_frames_fanout_and_byte_conservation(docs):
    frames = sample_frames(attach_blob(docs)).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in docs.collect():
        n = len(r["text"].encode("utf-8"))
        fs = sorted(by_doc[r["doc_id"]], key=lambda x: x["frame_idx"])
        assert len(fs) == max(math.ceil(n / FRAME_BYTES), 1)
        assert [f["frame_offset"] for f in fs] == [
            i * FRAME_BYTES for i in range(len(fs))
        ]
        # concatenated frames reassemble the original payload exactly
        assert b"".join(bytes(f["frame"]) for f in fs) == r["text"].encode("utf-8")


def test_sample_frames_null_blob(spark):
    df = spark.createDataFrame([(9, None)], "doc_id long, blob binary")
    rows = sample_frames(df).collect()
    assert len(rows) == 1 and rows[0]["frame_idx"] == 0
    assert bytes(rows[0]["frame"]) == b""


def test_real_decode_paths_are_gated(docs):
    with pytest.raises(NotImplementedError):
        resize_image(attach_blob(docs), 64, 64)


def test_meta_schema_stable(docs):
    df = decode_media_meta(attach_blob(docs))
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "media_type", "width", "height", "digest16",
    ]
