"""Round-5 batch-66 operators on crafted inputs, verified against
independent Python computations: mrl_dim_truncation_recall (prefix
-dim recall vs the full-dim cosine top-10), fusion_weight_sweep
(lambda sweep of linear bm25+cosine fusion scored by AP@10),
column_drift_audit (per-column null/distinct/length drift between
ingest halves).  Plan pins at the bottom."""

from __future__ import annotations

import math
import re

from pdf_extractor_spark.queries import (
    _FUSION_LAMBDAS,
    _MRL_DIMS,
    q_column_drift_audit,
    q_fusion_weight_sweep,
    q_mrl_dim_truncation_recall,
)

_K1, _B = 1.2, 0.75
_TERMS = ("spark", "scan", "dup")


def _rn2(x):
    if x is None:
        return None
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.01"),
                                     rounding=ROUND_HALF_UP))



def _r4(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"),
                                     rounding=ROUND_HALF_UP))


def _write_docs(spark, path, rows):
    """rows: (text, lang, source) or (text,) tuples -> en/s defaults;
    entries may be None for NULL columns."""
    data = []
    for i, r in enumerate(rows, 1):
        t, l, s = (r if isinstance(r, tuple) else (r, "en", "s"))
        data.append((i, t, l, s, len(t) if t else 0))
    spark.createDataFrame(
        data,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_emb(spark, path, vecs):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _f32(v):
    import numpy as np

    return [float(np.float32(x)) for x in v]


def _cosk(a, b, k):
    a, b = _f32(a)[:k], _f32(b)[:k]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return _r4(dot / max(na * nb, 1e-30))


# --------------------------------------------------------------------- MRL


def _mrl_ref(vecs):
    d = len(vecs[0])
    q = vecs[0]
    ids = list(range(1, len(vecs)))
    base = sorted(ids, key=lambda i: (-_cosk(vecs[i], q, d), i))[:10]
    out = []
    for k in _MRL_DIMS:
        topk = sorted(ids, key=lambda i: (-_cosk(vecs[i], q, k), i))[:10]
        hits = sum(1 for i in topk if i in set(base))
        out.append((k, hits, round(hits / 10.0, 4),
                    topk[0] in set(base)))
    return out


def test_mrl_matches_reference(spark, tmp_path):
    # information front-loaded: later dims are small noise
    vecs = []
    for i in range(40):
        v = [math.cos(0.37 * i), math.sin(0.21 * i + 1),
             0.5 * math.cos(0.11 * i)] + [0.01 * ((i * j) % 5 - 2)
                                          for j in range(61)]
        vecs.append(v)
    _write_emb(spark, tmp_path, vecs)
    got = [tuple(r) for r in
           q_mrl_dim_truncation_recall(spark, str(tmp_path)).collect()]
    assert got == _mrl_ref(vecs)
    # front-loaded embeddings: even 8 dims nearly reproduce the list
    assert got[0][2] >= 0.8


def test_mrl_back_loaded_collapses(spark, tmp_path):
    # all signal lives in dims 33..64: 8/16/32-dim prefixes are noise
    vecs = []
    for i in range(30):
        v = [0.001 * ((i * j) % 7 - 3) for j in range(32)] \
            + [math.cos(0.4 * i + j * 0.09) for j in range(32)]
        vecs.append(v)
    _write_emb(spark, tmp_path, vecs)
    rows = {r["trunc_dim"]: r for r in
            q_mrl_dim_truncation_recall(spark, str(tmp_path)).collect()}
    ref = {k: (h, rec, t1) for k, h, rec, t1 in _mrl_ref(vecs)}
    for k, r in rows.items():
        assert (r["hits_at_10"], r["recall_at_10"],
                r["top1_preserved"]) == ref[k]
    assert rows[32]["recall_at_10"] < 0.8   # prefix carries no signal


# ---------------------------------------------------------------- fusion


def _tokens(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _bm25_scores(texts):
    toks = {i + 1: _tokens(t) for i, t in enumerate(texts)}
    n_docs = len(texts)
    total = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in _TERMS}
    out = {}
    for d, v in toks.items():
        score, m = 0.0, 0
        for t in _TERMS:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += idf * (tf * (_K1 + 1)) / (
                tf + _K1 * (1 - _B + _B * len(v) * n_docs / total))
        if m:
            out[d] = (_r4(score), m)
    return out


def _fusion_ref(texts, vecs):
    bm = _bm25_scores(texts)
    lex = sorted(bm, key=lambda d: (-bm[d][0], d))[:50]
    q = vecs[0]
    cos = {i: _cosk(vecs[i], q, len(q)) for i in range(1, len(vecs))}
    cosr = sorted(cos, key=lambda i: (-cos[i], i))[:50]
    cand = sorted(set(lex) | set(cosr))
    out = []
    for lam in _FUSION_LAMBDAS:
        scored = sorted(
            cand,
            key=lambda d: (-_r4((bm[d][0] if d in bm and d in lex
                                 else 0.0)
                                + lam * (cos.get(d, 0.0)
                                         if d in cosr else 0.0)), d))
        top = scored[:10]
        apsum, rel_upto, nrel = 0.0, 0, 0
        for r, d in enumerate(top, 1):
            is_rel = d in bm and bm[d][1] >= 2
            if is_rel:
                rel_upto += 1
                nrel += 1
                apsum += rel_upto / r
        out.append((round(lam, 2), nrel,
                    round(apsum / nrel, 4) if nrel else None))
    return out


def test_fusion_matches_reference(spark, tmp_path):
    texts = [
        "spark scan dup", "spark scan", "scan dup", "spark only",
        "dup only", "plain one", "plain two", "plain three",
    ]
    # cosine arm prefers the NON-relevant plain docs
    vecs = [[1.0, 0.0]] + [
        [0.1, 1.0], [0.2, 1.0], [0.3, 1.0], [0.15, 1.0],
        [0.25, 1.0], [1.0, 0.05], [1.0, 0.1], [1.0, 0.15],
    ]
    _write_docs(spark, tmp_path, texts)
    _write_emb(spark, tmp_path, vecs)
    got = [tuple(r) for r in
           q_fusion_weight_sweep(spark, str(tmp_path)).collect()]
    ref = _fusion_ref(texts, vecs)
    assert got == ref
    # increasing lambda lets the (nonrelevant-leaning) cosine arm
    # dilute AP here: lambda=0 must be at least as good as lambda=8
    by = {g[0]: g[2] for g in got}
    assert by[0.0] >= by[8.0]


# ----------------------------------------------------------- column drift


def _drift_ref(rows):
    n = len(rows)
    cells = {"lang": [], "source": [], "text": []}
    for i, (t, l, s) in enumerate(rows, 1):
        half = 0 if i * 5 <= n * 4 else 1
        cells["text"].append((half, t))
        cells["lang"].append((half, l))
        cells["source"].append((half, s))
    out = []
    for col in sorted(cells):
        stats = {}
        for half in (0, 1):
            vs = [v for h, v in cells[col] if h == half]
            nn = len(vs)
            nulls = sum(1 for v in vs if v is None)
            dv = len({v for v in vs if v is not None})
            lens = [len(v.encode()) for v in vs if v is not None]
            stats[half] = (nulls / nn, dv / nn,
                           sum(lens) / len(lens) if lens else None)
        no, do_, lo = stats[0]
        nn_, dn, ln_ = stats[1]
        flag = (abs(nn_ - no) > 0.1
                or (lo is not None and ln_ is not None
                    and abs(ln_ - lo) > 0.2 * max(lo, 1.0)))
        out.append((col, _r4(no), _r4(nn_), _r4(do_), _r4(dn),
                    _rn2(lo), _rn2(ln_), flag))
    return out


def test_drift_matches_reference(spark, tmp_path):
    rows = ([("alpha beta", "en", "web")] * 12
            + [("gamma", "de", "wiki")] * 4
            # the new 20%: suddenly NULL langs and a new source
            + [("delta epsilon zeta", None, "fresh")] * 4)
    _write_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_column_drift_audit(spark, str(tmp_path)).collect()]
    assert got == _drift_ref(rows)
    by = {g[0]: g for g in got}
    assert by["lang"][7] is True        # null share exploded
    assert bool(by["lang"][1] == 0.0 and by["lang"][2] == 1.0)


def test_drift_stable_corpus_unflagged(spark, tmp_path):
    rows = [("same text body", "en", "web")] * 25
    _write_docs(spark, tmp_path, rows)
    got = q_column_drift_audit(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _drift_ref(
        [("same text body", "en", "web")] * 25)
    assert all(r["drift_flag"] is False for r in got)


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [("spark scan dup", "en", "a"), ("plain", "en", "b"),
                 ("scan dup", "de", "a"), ("spark", "en", "b")])
    _write_emb(spark, tmp_path,
               [[1.0, 0.0, 0.5, 0.2], [0.9, 0.1, 0.4, 0.2],
                [0.0, 1.0, 0.1, 0.6], [0.5, 0.5, 0.3, 0.3],
                [0.8, 0.2, 0.5, 0.1]])
    for fn, mx in ((q_mrl_dim_truncation_recall, 2),
                   (q_fusion_weight_sweep, 8),
                   (q_column_drift_audit, 2)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
