"""Round-5 batch-59 operators on crafted inputs, verified against
independent Python computations: err_eval (cascade-model expected
reciprocal rank over the BM25 arm), rocchio_expansion_topk
(cosine-space pseudo-relevance feedback re-rank), and
balanced_interleave_eval (Joachims balanced interleaving of the
lexical and semantic arms with term-coverage credit).  Plan pins at
the bottom."""

from __future__ import annotations

import math
import re

from pdf_extractor_spark.queries import (
    _ROC_BETA,
    _ROC_FEEDBACK,
    q_balanced_interleave_eval,
    q_err_eval,
    q_rocchio_expansion_topk,
)

_K1, _B = 1.2, 0.75
_TERMS = ("spark", "scan", "dup")

def _r4(x):
    """Spark/DuckDB round(double, 4) is HALF_UP on the exact binary
    value of the double; python's round() is banker's.  Match the
    engines."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"),
                                     rounding=ROUND_HALF_UP))



def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _tokens(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _bm25(texts):
    """{doc_id: (bm25, n_distinct_terms_matched)} — op constants."""
    toks = {i + 1: _tokens(t) for i, t in enumerate(texts)}
    n_docs = len(texts)
    total = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in _TERMS}
    out = {}
    for d, v in toks.items():
        score, matched = 0.0, 0
        for t in _TERMS:
            tf = v.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += idf * (tf * (_K1 + 1)) / (
                tf + _K1 * (1 - _B + _B * len(v) * n_docs / total))
        if matched:
            out[d] = (_r4(score), matched)
    return out


def _bm25_ranking(texts, depth=20):
    bm = _bm25(texts)
    order = sorted(bm, key=lambda d: (-bm[d][0], d))[:depth]
    return [(d, bm[d][1]) for d in order]       # [(doc_id, grade)]


# --------------------------------------------------------------- err_eval


def _err_ref(texts):
    ranked = _bm25_ranking(texts)
    out = []
    for k in (5, 10, 20):
        err, keep = 0.0, 1.0
        nrel, first = 0, None
        for r, (d, g) in enumerate(ranked, 1):
            rr = (2 ** g - 1) / 8.0
            if r <= k:
                err += rr / r * keep
                if g > 0:
                    nrel += 1
            if g > 0 and first is None:
                first = r
            keep *= 1.0 - rr
        out.append((k, _r4(err), nrel, first))
    return out


def test_err_matches_reference(spark, tmp_path):
    texts = [
        "spark scan dup pipeline",          # grade 3
        "spark only here",                  # grade 1
        "plain words " * 3,
        "scan scan scan the spark",         # grade 2
        "dup dup",                          # grade 1
        "nothing relevant",
    ]
    _write_docs(spark, tmp_path, texts)
    rows = q_err_eval(spark, str(tmp_path)).collect()
    got = [(r["k"], r["err"], r["n_rel_topk"], r["first_rel_rank"])
           for r in rows]
    assert got == _err_ref(texts)


def test_err_cascade_suppresses_tail(spark, tmp_path):
    # a perfect doc at rank 1 -> ERR ~ 7/8; later hits add <= 1/8 total
    texts = ["spark scan dup", "spark scan dup extra pad",
             "spark", "scan", "dup", "noise"]
    _write_docs(spark, tmp_path, texts)
    rows = {r["k"]: r for r in
            q_err_eval(spark, str(tmp_path)).collect()}
    ref = dict((k, (e, n, f)) for k, e, n, f in _err_ref(texts))
    for k, r in rows.items():
        assert (r["err"], r["n_rel_topk"], r["first_rel_rank"]) == ref[k]
    assert rows[5]["err"] >= 7 / 8 * (1 / 1) * 0.99  # early-stop mass
    assert rows[20]["err"] - rows[5]["err"] < 0.01


# ---------------------------------------------------------------- rocchio


def _f32(v):
    """The parquet column is float32 — quantize reference inputs the
    same way before the float64 math."""
    import numpy as np

    return [float(np.float32(x)) for x in v]


def _cos(a, b):
    a, b = _f32(a), _f32(b)
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return _r4(dot / max(na * nb, 1e-30))


def _rocchio_ref(vecs):
    """vecs[0] is the query; returns rows (vec_id, base_cos,
    feedback_cos, score, base_rank, rocchio_rank) for the top 10."""
    q = vecs[0]
    base = {i: _cos(v, q) for i, v in enumerate(vecs) if i != 0}
    order = sorted(base, key=lambda i: (-base[i], i))
    fb = order[:_ROC_FEEDBACK]
    rows = []
    for i in order:
        fbi = sum(int(round(_cos(vecs[i], vecs[f]) * 10000))
                  for f in fb)
        fc = fbi / (len(fb) * 10000.0)
        score = _r4(base[i] + _ROC_BETA * fc)
        rows.append([i, base[i], _r4(fc), score,
                     order.index(i) + 1])
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [(r[0], r[1], r[2], r[3], r[4], j + 1)
            for j, r in enumerate(rows[:10])]


def test_rocchio_matches_reference(spark, tmp_path):
    # query along x; a "bridge" cluster near the top hits gets pulled up
    vecs = [
        [1.0, 0.0, 0.0],            # 0 = query
        [1.0, 0.1, 0.0],            # close to q
        [1.0, 0.2, 0.0],
        [0.9, 0.3, 0.1],
        [0.8, 0.4, 0.1],
        [0.7, 0.5, 0.2],
        [0.0, 1.0, 0.0],            # orthogonal
        [0.2, 0.9, 0.3],            # near the feedback centroid's tail
        [0.5, 0.5, 0.1],
        [-1.0, 0.0, 0.0],           # anti-query
        [0.6, 0.45, 0.15],
    ]
    _write_embeddings(spark, tmp_path, vecs)
    rows = q_rocchio_expansion_topk(spark, str(tmp_path)).collect()
    got = [(r["vec_id"], r["base_cos"], r["feedback_cos"],
            r["rocchio_score"], r["base_rank"], r["rocchio_rank"])
           for r in rows]
    assert got == _rocchio_ref(vecs)


def test_rocchio_pulls_up_centroid_neighbors(spark, tmp_path):
    # doc 9 is mediocre vs q but VERY close to all 5 feedback docs;
    # doc 10 has the same base cosine but is far from the cluster
    base_cluster = [[1.0, 0.05 * i, 0.0] for i in range(1, 6)]
    vecs = ([[1.0, 0.0, 0.0]] + base_cluster
            + [[0.0, 0.0, 1.0]] * 3           # filler, orthogonal
            + [[0.7071, 0.1, 0.0],            # 9: near cluster plane
               [0.7071, 0.0, 0.1]])           # 10: same base cos ~, off-plane
    _write_embeddings(spark, tmp_path, vecs)
    rows = {r["vec_id"]: r for r in
            q_rocchio_expansion_topk(spark, str(tmp_path)).collect()}
    ref = {r[0]: r for r in _rocchio_ref(vecs)}
    assert set(rows) == set(ref)
    for vid, r in rows.items():
        assert (r["rocchio_score"], r["rocchio_rank"]) == \
            (ref[vid][3], ref[vid][5])
    assert rows[9]["feedback_cos"] > rows[10]["feedback_cos"]
    assert rows[9]["rocchio_rank"] < rows[10]["rocchio_rank"]


# ------------------------------------------------------ balanced interleave


def _interleave_ref(texts, vecs):
    lex = [d for d, _ in _bm25_ranking(texts)]
    q = vecs[0]
    cosr = sorted((i for i in range(1, len(vecs))),
                  key=lambda i: (-_cos(vecs[i], q), i))[:20]
    pos = {}
    team = {}
    both = set(lex) & set(cosr)
    for d in set(lex) | set(cosr):
        pa = 2 * (lex.index(d) + 1) - 1 if d in lex else 10 ** 6
        pb = 2 * (cosr.index(d) + 1) if d in cosr else 10 ** 6 + 1
        pos[d] = min(pa, pb)
        team[d] = "lexical" if pa < pb else "semantic"
    top = sorted(pos, key=lambda d: (pos[d], d))[:10]
    grades = {d: g for d, g in _bm25_ranking(texts)}
    pl = sum(1 for d in top if team[d] == "lexical")
    ps = sum(1 for d in top if team[d] == "semantic")
    cl = sum(1 for d in top if team[d] == "lexical"
             and grades.get(d, 0) > 0)
    cs = sum(1 for d in top if team[d] == "semantic"
             and grades.get(d, 0) > 0)
    ov = sum(1 for d in top if d in both)
    win = "lexical" if cl > cs else "semantic" if cs > cl else "tie"
    return (10, pl, cl, ps, cs, ov, win)


def test_interleave_matches_reference(spark, tmp_path):
    texts = [
        "spark scan dup all three",
        "spark spark spark",
        "plain text",
        "scan here",
        "dup there",
        "nothing",
        "more nothing",
        "spark dup pair",
    ]
    # query = x axis; semantic arm prefers the NON-matching docs 3/6/7
    vecs = [[1.0, 0.0]] + [
        [0.1, 1.0],   # 1
        [0.2, 1.0],   # 2
        [1.0, 0.1],   # 3
        [0.3, 1.0],   # 4
        [0.4, 1.0],   # 5
        [1.0, 0.2],   # 6
        [1.0, 0.3],   # 7
        [0.5, 1.0],   # 8
    ]
    _write_docs(spark, tmp_path, texts)
    _write_embeddings(spark, tmp_path, vecs)
    r = q_balanced_interleave_eval(spark, str(tmp_path)).collect()
    assert len(r) == 1
    got = (r[0]["interleaved_depth"], r[0]["picks_lexical"],
           r[0]["credited_lexical"], r[0]["picks_semantic"],
           r[0]["credited_semantic"], r[0]["overlap_in_top10"],
           r[0]["winner"])
    assert got == _interleave_ref(texts, vecs)
    # lexical arm holds the graded docs here, so it must win
    assert got[6] == "lexical"


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    texts = ["spark scan dup", "spark", "plain", "scan dup"]
    vecs = [[1.0, 0.0], [1.0, 0.1], [0.5, 0.5], [0.0, 1.0], [0.9, 0.1]]
    _write_docs(spark, tmp_path, texts)
    _write_embeddings(spark, tmp_path, vecs)
    # the BM25 lineage's tf/dl/stats sub-chains each re-expand the
    # token projection (the accepted ndcg_eval shape — all are
    # query-selectivity-sized after pushdown), so the lexical-arm ops
    # carry a handful of scans; rocchio is pinned tight.
    for fn, max_scans in ((q_err_eval, 6),
                          (q_rocchio_expansion_topk, 3),
                          (q_balanced_interleave_eval, 8)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= max_scans, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
