"""Round-5 batch-49 operators on crafted inputs, verified against
independent Python computations: pca_power_iteration (dominant
eigenpair), rendezvous_shard_audit (HRW vs mod resharding),
neardup_transitivity_audit (chaining inside verified clusters)."""

from __future__ import annotations

import hashlib
import math
import re
from itertools import combinations

import numpy as np

from pdf_extractor_spark.queries import (
    _RDV_N1,
    _RDV_N2,
    _VERIFY_JACCARD_MIN,
    q_neardup_transitivity_audit,
    q_pca_power_iteration,
    q_rendezvous_shard_audit,
)


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(i + 1, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


# ----------------------------------------------------- pca_power_iteration


def _pca_ref(vecs):
    m = np.asarray(vecs, dtype=np.float64)
    n, d = m.shape
    mu = m.mean(axis=0)
    cov = (m.T @ m) / n - np.outer(mu, mu)
    v = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(3):
        w = cov @ v
        nrm = float(np.linalg.norm(w))
        if nrm > 0:
            v = w / nrm
    lam = float(v @ cov @ v)
    tr = float(np.trace(cov))
    top = int(np.argmax(np.abs(v)))
    return (round(lam, 4), round(tr, 4), round(lam / tr, 4),
            top + 1, round(abs(float(v[top])), 4))


def test_pca_oblique_dominant_direction(spark, tmp_path):
    # variance lives along (1,1,0,0)/sqrt(2) — invisible to any single
    # diagonal entry, visible to the eigen decomposition
    u = np.array([1.0, 1.0, 0.0, 0.0]) / math.sqrt(2)
    vecs = [(t * u + np.array([0, 0, 0.1 * ((i % 2) * 2 - 1), 0])).tolist()
            for i, t in enumerate([-3, -1, 1, 3, -2, 2])]
    _write_embeddings(spark, tmp_path, vecs)
    lam, tr, share, top, load = _pca_ref(vecs)
    row = q_pca_power_iteration(spark, str(tmp_path)).collect()[0]
    assert (row["n_vecs"], row["dim"]) == (6, 4)
    assert row["lambda1"] == lam
    assert row["trace_var"] == tr
    assert row["explained_share"] == share
    assert row["top_dim"] == top and top in (1, 2)
    assert row["top_abs_loading"] == load
    # loading of the oblique direction ~ 1/sqrt(2), share ~ 1
    assert 0.69 < load < 0.72 and share > 0.99


def test_pca_isotropic_low_share(spark, tmp_path):
    # axis-aligned one-hots with equal scale: no dominant direction
    vecs = []
    for i in range(4):
        v = [0.0] * 4
        v[i] = 1.0
        vecs += [v, [-x for x in v]]
    _write_embeddings(spark, tmp_path, vecs)
    lam, tr, share, _, _ = _pca_ref(vecs)
    row = q_pca_power_iteration(spark, str(tmp_path)).collect()[0]
    assert row["lambda1"] == lam and row["explained_share"] == share
    assert share < 0.3


# --------------------------------------------------- rendezvous_shard_audit


def _md5i(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rdv_ref(doc_ids):
    def rdv(doc, n):
        return max((_md5i(f"{doc}:{s}") * 32 + s)
                   for s in range(n)) % 32

    n = len(doc_ids)
    mod_mv = sum(1 for d in doc_ids if d % _RDV_N1 != d % _RDV_N2)
    rdv_old = {d: rdv(d, _RDV_N1) for d in doc_ids}
    rdv_new = {d: rdv(d, _RDV_N2) for d in doc_ids}
    rdv_mv = sum(1 for d in doc_ids if rdv_old[d] != rdv_new[d])
    from collections import Counter
    rc = Counter(rdv_new.values())
    mc = Counter(d % _RDV_N2 for d in doc_ids)
    return (round(mod_mv / n, 4), round(rdv_mv / n, 4),
            round(max(rc.values()) * _RDV_N2 / n, 4),
            round(max(mc.values()) * _RDV_N2 / n, 4))


def test_rendezvous_vs_mod_matches_python(spark, tmp_path):
    n = 90
    _write_docs(spark, tmp_path, [f"doc number {i}" for i in range(n)])
    doc_ids = list(range(1, n + 1))
    mod_mv, rdv_mv, rb, mb = _rdv_ref(doc_ids)
    row = q_rendezvous_shard_audit(spark, str(tmp_path)).collect()[0]
    assert row["n_keys"] == n
    assert row["mod_moved_share"] == mod_mv
    assert row["rdv_moved_share"] == rdv_mv
    assert row["rdv_balance"] == rb
    assert row["mod_balance"] == mb
    assert row["rdv_theoretical_move"] == round(1 / _RDV_N2, 4)
    # the point of HRW: an order of magnitude fewer moves than mod
    assert rdv_mv < 0.35 < mod_mv


# ----------------------------------------------- neardup_transitivity_audit


def _shingles(text):
    t = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    if len(t) >= 3:
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
    return {" ".join(t)}


def _jac(a, b):
    return round(len(a & b) / len(a | b), 4)


def test_transitivity_chain_detected(spark, tmp_path):
    # 6-doc drift chain: neighbors nearly identical, endpoints far apart
    base = [f"w{i:02d}" for i in range(40)]
    texts = []
    for k in range(6):
        toks = list(base)
        for p in range(4 * k):  # CUMULATIVE rewrite: doc k differs from
            toks[p] = f"x{p:02d}"  # doc k-1 in 4 tokens, from doc 0 in 4k
        texts.append(" ".join(toks))
    _write_docs(spark, tmp_path, texts)
    row = q_neardup_transitivity_audit(spark, str(tmp_path)).collect()[0]
    # expected: adjacent jaccards high, endpoint pairs low
    sets = [_shingles(t) for t in texts]
    jacs = [_jac(a, b) for a, b in combinations(sets, 2)]
    n_direct = sum(1 for j in jacs if j >= _VERIFY_JACCARD_MIN)
    assert row["clusters_audited"] == 1
    assert row["clusters_skipped"] == 0
    assert row["intra_pairs"] == 15
    assert row["direct_pairs"] == n_direct
    assert row["direct_share"] == round(n_direct / 15, 4)
    assert row["min_pair_jaccard"] == min(jacs)
    assert row["direct_share"] < 1.0  # the chain IS over-merged


def test_transitivity_identical_pair_fully_direct(spark, tmp_path):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",
        "completely different words entirely here now truly",
    ]
    _write_docs(spark, tmp_path, texts)
    row = q_neardup_transitivity_audit(spark, str(tmp_path)).collect()[0]
    assert row["clusters_audited"] == 1
    assert row["intra_pairs"] == 1
    assert row["direct_pairs"] == 1
    assert row["direct_share"] == 1.0
    assert row["min_pair_jaccard"] == 1.0
    assert row["mean_j_chained"] is None
