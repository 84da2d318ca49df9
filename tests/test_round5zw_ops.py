"""Round-5 batch-51 operators on crafted inputs, verified against
independent Python computations: sequence_boundary_contamination
(cross-doc attention share), coverage_knee_detection (Kneedle chord
gap), stylometric_burrows_delta (per-word z-score style distance)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from itertools import combinations

from pdf_extractor_spark.queries import (
    _BURROWS_TOPW,
    _SEQ_CTX_GRID,
    q_coverage_knee_detection,
    q_sequence_boundary_contamination,
    q_stylometric_burrows_delta,
)


def _write_docs(spark, path, rows):
    """rows: (text, source)"""
    spark.createDataFrame(
        [(i + 1, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


# ------------------------------------------- sequence_boundary_contamination


def test_boundary_contamination_exact_formula(spark, tmp_path):
    lens = [300, 50, 1000, 4]
    rows = [(" ".join(f"t{i}w{j}" for j in range(n)), "s")
            for i, n in enumerate(lens)]
    _write_docs(spark, tmp_path, rows)
    total = sum(lens)
    out = {r["context_len"]: r
           for r in q_sequence_boundary_contamination(
               spark, str(tmp_path)).collect()}
    assert set(out) == set(_SEQ_CTX_GRID)
    for L in _SEQ_CTX_GRID:
        cont = sum(min(n, L - 1) for n in lens[1:])  # first doc exempt
        r = out[L]
        assert r["total_tokens"] == total
        assert r["contaminated_tokens"] == cont
        assert r["contaminated_share"] == round(cont / total, 4)
    # monotone in L and saturating
    assert (out[128]["contaminated_tokens"]
            < out[512]["contaminated_tokens"]
            <= out[2048]["contaminated_tokens"])


def test_boundary_contamination_single_doc_zero(spark, tmp_path):
    _write_docs(spark, tmp_path, [("one single document here", "s")])
    for r in q_sequence_boundary_contamination(
            spark, str(tmp_path)).collect():
        assert r["contaminated_tokens"] == 0
        assert r["contaminated_share"] == 0.0


# ------------------------------------------------- coverage_knee_detection


def _knee_ref(texts):
    cnt = Counter(w for t in texts for w in _toks(t))
    total = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    v = len(ordered)
    best = None
    cum = 0.0
    for rk, (_, c) in enumerate(ordered, 1):
        cum += c
        gap = cum / total - rk / v
        if best is None or gap > best[2] + 1e-15:
            best = (rk, cum / total, gap)
    return v, total, best


def test_knee_zipfy_corpus_matches_python(spark, tmp_path):
    # zipf-ish: token k appears ~N/k times
    texts = []
    for k in range(1, 21):
        texts.append(" ".join([f"word{k:02d}"] * (120 // k)))
    _write_docs(spark, tmp_path, [(t, "s") for t in texts])
    v, total, (rk, cov, gap) = _knee_ref(texts)
    row = q_coverage_knee_detection(spark, str(tmp_path)).collect()[0]
    assert (row["vocab_size"], row["total_tokens"]) == (v, total)
    assert row["knee_rank"] == rk
    assert row["knee_coverage"] == round(cov, 4)
    assert row["chord_gap"] == round(gap, 4)
    assert row["knee_rank_share"] == round(rk / v, 6)
    assert 0 < rk < v  # interior knee on a convex curve


def test_knee_uniform_corpus_degenerate(spark, tmp_path):
    # all tokens equally frequent: curve == chord, gap 0, knee at rank 1
    texts = [f"u{i:02d} u{i:02d}" for i in range(10)]
    _write_docs(spark, tmp_path, [(t, "s") for t in texts])
    row = q_coverage_knee_detection(spark, str(tmp_path)).collect()[0]
    assert row["chord_gap"] == 0.0
    assert row["knee_rank"] == 1


# ---------------------------------------------- stylometric_burrows_delta


def _burrows_ref(rows):
    per_src = defaultdict(list)
    for t, s in rows:
        per_src[s] += _toks(t)
    tot = Counter()
    for ws in per_src.values():
        tot.update(ws)
    vocab = [w for w, _ in sorted(tot.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:_BURROWS_TOPW]]
    srcs = sorted(per_src)
    f = {(s, w): per_src[s].count(w) / len(per_src[s])
         for s in srcs for w in vocab}
    z = {}
    for w in vocab:
        vals = [f[(s, w)] for s in srcs]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum(v * v for v in vals) / len(vals) - mu * mu)
        for s in srcs:
            z[(s, w)] = (f[(s, w)] - mu) / sd if sd > 0 else 0.0
    out = {}
    for a, b in combinations(srcs, 2):
        gaps = [abs(z[(a, w)] - z[(b, w)]) for w in vocab]
        out[(a, b)] = (round(sum(gaps) / len(gaps), 4),
                       round(max(gaps), 4), len(vocab))
    return out


def test_burrows_separates_styles(spark, tmp_path):
    # s1/s2 share style (heavy 'the of'), s3 is bullet-styled
    rows = (
        [("the cat of the house sat on the mat of wonder", "s1")] * 3
        + [("the dog of the yard ran to the gate of stone", "s2")] * 3
        + [("item alpha item beta item gamma item delta item", "s3")] * 3
    )
    _write_docs(spark, tmp_path, rows)
    expect = _burrows_ref(rows)
    got = {(r["source_a"], r["source_b"]):
           (r["burrows_delta"], r["max_word_gap"], r["n_words"])
           for r in q_stylometric_burrows_delta(
               spark, str(tmp_path)).collect()}
    assert got == expect
    # style twins are closer to each other than to the bullet source
    assert got[("s1", "s2")][0] < got[("s1", "s3")][0]
    assert got[("s1", "s2")][0] < got[("s2", "s3")][0]


def test_burrows_zero_variance_words_contribute_zero(spark, tmp_path):
    # identical relative frequencies everywhere -> delta 0
    rows = [("same words here", "a"), ("same words here", "b")]
    _write_docs(spark, tmp_path, rows)
    out = q_stylometric_burrows_delta(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["burrows_delta"] == 0.0
    assert out[0]["max_word_gap"] == 0.0
