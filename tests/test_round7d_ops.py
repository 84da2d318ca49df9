"""Round-5 batch-83: kmeans_sample_lloyd — the oracled relational twin
of the catalog's single no-oracle entry (kmeans_centroids).  Verified
against an independent Python Lloyd implementation on crafted inputs;
plan pin at the bottom."""

from __future__ import annotations

import hashlib
import math
import struct
from collections import Counter, defaultdict

from pdf_extractor_spark.queries import (
    _KMSL_K,
    _KMSL_NS,
    q_kmeans_sample_lloyd,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(vid, [float(x) for x in v], 0) for vid, v in vecs],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _kmsl_ref(vecs):
    emap = {vid: [round(_f32(x), 6) for x in v] for vid, v in vecs}
    samp = sorted(emap, key=lambda vid: (_md5u(str(vid)), vid))[:_KMSL_NS]
    cents = {i + 1: emap[s] for i, s in enumerate(samp[:_KMSL_K])}

    def assign(cents):
        return {vid: min(cents.items(), key=lambda t: (
            round(sum((a - b) ** 2
                      for a, b in zip(emap[vid], t[1])), 6), t[0]))[0]
            for vid in samp}

    for _ in range(2):
        a = assign(cents)
        cents = {cid: [sum(col) / len(col) for col in
                       zip(*[emap[v] for v, c in a.items() if c == cid])]
                 for cid in set(a.values())}
    a = assign(cents)
    cc = Counter(a.values())
    inert = defaultdict(float)
    for vid, cid in a.items():
        inert[cid] += round(sum((x - y) ** 2
                                for x, y in zip(emap[vid], cents[cid])), 6)
    return [(cid, cc[cid], _r(inert[cid], 2)) for cid in sorted(cc)]


def _mk_vecs(n=100, dim=8):
    return [(vid,
             [math.sin(vid * 0.37 + j * 0.91)
              * (1 + 0.2 * ((vid + j) % 3)) for j in range(dim)])
            for vid in range(1, n + 1)]


def test_kmsl_matches_python_lloyd(spark, tmp_path):
    vecs = _mk_vecs()
    _write_embeddings(spark, tmp_path, vecs)
    got = q_kmeans_sample_lloyd(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _kmsl_ref(vecs)
    assert sum(r["n_members"] for r in got) == _KMSL_NS
    assert all(r["inertia"] >= 0 for r in got)


def test_kmsl_separated_clusters_blob_structure(spark, tmp_path):
    # four tight, well-separated blobs — with md5 seeding two seeds
    # land in one blob, so after two Lloyd steps the fixture yields
    # the classic k-means geometry: pure blobs collapse to ~zero
    # inertia, the unlucky merged cluster carries the separation
    # mass, and an emptied seed's cluster is DROPPED from the output
    # (standard empty-cluster behavior, pinned here)
    vecs = []
    for vid in range(1, 81):
        blob = vid % 4
        base = [100.0 * (blob == b) for b in range(4)] + [0.0] * 4
        vecs.append((vid, [base[j] + 0.01 * ((vid + j) % 5)
                           for j in range(8)]))
    _write_embeddings(spark, tmp_path, vecs)
    got = q_kmeans_sample_lloyd(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _kmsl_ref(vecs)
    inert = sorted(r["inertia"] for r in got)
    assert len(got) <= _KMSL_K            # empty clusters dropped
    assert inert[0] < 1.0 and inert[1] < 1.0   # pure blobs are tight
    assert inert[-1] > 1000               # the merged pair is not


def test_kmsl_sample_capped(spark, tmp_path):
    vecs = _mk_vecs(n=300)
    _write_embeddings(spark, tmp_path, vecs)
    got = q_kmeans_sample_lloyd(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _kmsl_ref(vecs)
    assert sum(r["n_members"] for r in got) == _KMSL_NS


def test_kmsl_plan_single_scan(spark, tmp_path):
    _write_embeddings(spark, tmp_path, _mk_vecs(n=40))
    plan = q_kmeans_sample_lloyd(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1     # checkpointed sample
