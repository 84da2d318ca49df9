"""Round-5 batch-45 operators on crafted inputs, verified against
independent Python computations: rrf_fusion_topk (reciprocal-rank
fusion of the BM25 and cosine arms), ndcg_eval (graded term-coverage
NDCG of the BM25 ranking), g_test_source_lang (likelihood-ratio
independence test with Wilson-Hilferty critical value)."""

from __future__ import annotations

import math
import re

from pdf_extractor_spark.queries import (
    q_g_test_source_lang,
    q_ndcg_eval,
    q_rrf_fusion_topk,
)

_K1, _B = 1.2, 0.75
_TERMS = ("spark", "scan", "dup")


def _write_docs(spark, path, texts, langs=None, sources=None):
    n = len(texts)
    langs = langs or ["en"] * n
    sources = sources or ["s"] * n
    spark.createDataFrame(
        [(i + 1, t, langs[i], sources[i], len(t))
         for i, t in enumerate(texts)],
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
    """Independent BM25 reference matching the op's constants/rounding:
    returns {doc_id: (bm25, n_distinct_terms_matched)}."""
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
            out[d] = (round(score, 4), matched)
    return out


# ------------------------------------------------------------ rrf_fusion


def test_rrf_fusion_exact_scores_and_order(spark, tmp_path):
    # only doc 1 matches any query term -> lexical list is [doc1]
    _write_docs(spark, tmp_path, [
        "spark scan dup", "plain words", "plain words",
        "plain words", "plain words",
    ])
    # vec 0 is the query; cosine order: v1 (1.0) > v4 (.8944) > v2
    # (.7071) > v3 (0.0)
    _write_embeddings(spark, tmp_path, [
        [1, 0, 0, 0], [1, 0, 0, 0], [1, 1, 0, 0],
        [0, 1, 0, 0], [1, 0.5, 0, 0],
    ])
    rows = q_rrf_fusion_topk(spark, str(tmp_path)).collect()
    got = [(r["doc_id"], r["lex_rank"], r["cos_rank"], r["rrf"])
           for r in rows]
    assert got == [
        (1, 1, 1, round(1 / 61 + 1 / 61, 6)),
        (4, None, 2, round(1 / 62, 6)),
        (2, None, 3, round(1 / 63, 6)),
        (3, None, 4, round(1 / 64, 6)),
    ]


def test_rrf_union_keeps_single_arm_docs(spark, tmp_path):
    # doc 6 matches lexically but has NO embedding row; vec 5 has an
    # embedding but its doc has no query terms -> both still fused
    _write_docs(spark, tmp_path, [
        "plain", "plain", "plain", "plain", "plain", "spark scan dup",
    ])
    _write_embeddings(spark, tmp_path, [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 1, 0, 0],
        [0, 1, 0, 0], [0, 1, 0, 0], [1, 0, 0, 0],
    ])
    out = {r["doc_id"]: r for r in
           q_rrf_fusion_topk(spark, str(tmp_path)).collect()}
    # doc 6: lexical arm only (no vec_id=6 embedding row)
    assert out[6]["lex_rank"] == 1 and out[6]["cos_rank"] is None
    assert out[6]["rrf"] == round(1 / 61, 6)
    # doc 5: cosine arm only (vec 5 = query direction, rank 1)
    assert out[5]["lex_rank"] is None and out[5]["cos_rank"] == 1
    assert out[5]["rrf"] == round(1 / 61, 6)
    # zero-cos ties break on vec_id: v1..v4 -> ranks 2..5
    assert out[2]["lex_rank"] is None and out[2]["cos_rank"] == 3
    assert out[2]["rrf"] == round(1 / 63, 6)


# -------------------------------------------------------------- ndcg_eval


def _ndcg_ref(texts):
    sc = _bm25(texts)
    ranked = sorted(sc, key=lambda d: (-sc[d][0], d))[:20]
    rel = {d: float(m) for d, (_, m) in sc.items()}
    ideal = sorted(rel, key=lambda d: (-rel[d], d))[:20]
    rows = []
    for k in (5, 10, 20):
        dcg = sum((2 ** rel.get(d, 0.0) - 1) / math.log2(1 + r)
                  for r, d in enumerate(ranked[:k], 1))
        idcg = sum((2 ** rel[d] - 1) / math.log2(1 + r)
                   for r, d in enumerate(ideal[:k], 1))
        rows.append((k, round(dcg, 4), round(idcg, 4),
                     round(dcg / idcg, 4) if idcg else None))
    return rows


def test_ndcg_saturation_inversion_detected(spark, tmp_path):
    # a 1-token "dup" doc outranks the 3-term doc buried in filler
    texts = [
        "dup",
        "spark scan dup " + "filler " * 100,
        "spark scan",
        "plain words here",
        "plain words here",
    ]
    _write_docs(spark, tmp_path, texts)
    sc = _bm25(texts)
    assert sc[1][0] > sc[2][0]  # the inversion the metric must see
    got = [(r["k"], r["dcg"], r["idcg"], r["ndcg"])
           for r in q_ndcg_eval(spark, str(tmp_path)).collect()]
    expect = _ndcg_ref(texts)
    assert got == expect
    assert all(row[3] < 1.0 for row in got)


def test_ndcg_ideal_ranking_scores_one(spark, tmp_path):
    texts = ["spark scan dup", "spark scan", "spark", "plain", "plain"]
    _write_docs(spark, tmp_path, texts)
    got = [(r["k"], r["ndcg"]) for r in
           q_ndcg_eval(spark, str(tmp_path)).collect()]
    expect = [(k, nd) for k, _, _, nd in _ndcg_ref(texts)]
    assert got == expect
    assert all(nd == 1.0 for _, nd in got)


# ----------------------------------------------------- g_test_source_lang


def _g_ref(cells):
    n = sum(cells.values())
    rs, cs = {}, {}
    for (s, lg), o in cells.items():
        rs[s] = rs.get(s, 0) + o
        cs[lg] = cs.get(lg, 0) + o
    g = 2 * sum(o * math.log(o * n / (rs[s] * cs[lg]))
                for (s, lg), o in cells.items())
    df = (len(rs) - 1) * (len(cs) - 1)
    c05 = df * (1 - 2 / (9 * df)
                + 1.6449 * math.sqrt(2 / (9 * df))) ** 3 if df else None
    return n, df, g, c05


def _write_contingency(spark, tmp_path, cells):
    texts, langs, sources = [], [], []
    for (s, lg), o in cells.items():
        texts += ["x"] * o
        langs += [lg] * o
        sources += [s] * o
    _write_docs(spark, tmp_path, texts, langs=langs, sources=sources)


def test_g_test_dependent_table_matches_python(spark, tmp_path):
    cells = {("s1", "en"): 30, ("s1", "de"): 10,
             ("s2", "en"): 10, ("s2", "de"): 30}
    _write_contingency(spark, tmp_path, cells)
    n, df, g, c05 = _g_ref(cells)
    row = q_g_test_source_lang(spark, str(tmp_path)).collect()[0]
    assert (row["n_docs"], row["df"]) == (n, df)
    assert row["g_stat"] == round(g, 4)
    assert row["mi_nats"] == round(g / (2 * n), 6)
    assert row["crit_05"] == round(c05, 4)
    assert g > c05 and row["dependent"]


def test_g_test_independent_table_zero_g(spark, tmp_path):
    cells = {("s1", "en"): 20, ("s1", "de"): 20,
             ("s2", "en"): 10, ("s2", "de"): 10}
    _write_contingency(spark, tmp_path, cells)
    row = q_g_test_source_lang(spark, str(tmp_path)).collect()[0]
    assert row["g_stat"] == 0.0
    assert not row["dependent"]


def test_g_test_degenerate_single_source_null_guard(spark, tmp_path):
    cells = {("s1", "en"): 5, ("s1", "de"): 5}
    _write_contingency(spark, tmp_path, cells)
    row = q_g_test_source_lang(spark, str(tmp_path)).collect()[0]
    assert row["df"] == 0
    assert row["crit_05"] is None and row["dependent"] is False
