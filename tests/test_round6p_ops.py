"""Round-5 batch-69 operators on crafted inputs, verified against
independent Python computations: lepage_location_scale (joint
Wilcoxon + exact-tie Ansari z's), renyi_entropy_spectrum (order
0/1/2/inf entropies of the unigram distribution), bm25_param_sweep
((k1, b) grid scored by AP@10).  Plan pins at the bottom."""

from __future__ import annotations

import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _BM25_SWEEP_B,
    _BM25_SWEEP_K1,
    q_bm25_param_sweep,
    q_lepage_location_scale,
    q_renyi_entropy_spectrum,
)

_TERMS = ("spark", "scan", "dup")


def _r4(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"),
                                     rounding=ROUND_HALF_UP))


def _write_docs_nchars(spark, path, rows):
    spark.createDataFrame(
        [(i, "x" * n, "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_text(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ----------------------------------------------------------------- lepage


def _lepage_ref(a, b):
    """a, b: value lists for groups 1 and 2 (two largest sources)."""
    pooled = sorted(a + b)
    nn = float(len(pooled))
    supp = sorted(set(pooled))
    cum = 0
    zw_parts = []
    for v in supp:
        t = pooled.count(v)
        lo, hi = cum + 1, cum + t
        cum += t
        r_mid = lo - 1 + (t + 1) / 2.0
        s_ab = sum(min(r, nn + 1 - r) for r in range(lo, hi + 1)) / t
        c1 = a.count(v)
        c2 = b.count(v)
        zw_parts.append((t, r_mid, s_ab, c1, c2))
    n1, n2 = float(len(a)), float(len(b))

    def zstat(fn):
        stat = sum(c2 * fn(p) for p in zw_parts
                   for c2 in [p[4]])
        st = sum(p[0] * fn(p) for p in zw_parts)
        st2 = sum(p[0] * fn(p) ** 2 for p in zw_parts)
        mu = n2 * st / nn
        var = n1 * n2 / (nn * (nn - 1)) * (st2 - st * st / nn)
        return (stat - mu) / math.sqrt(var)

    zw = zstat(lambda p: p[1])
    zab = zstat(lambda p: p[2])
    ll = zw * zw + zab * zab
    verdict = ("location_or_scale_differ" if ll > 5.9915
               else "distributions_consistent")
    return (int(n1), int(n2), _r4(zw), _r4(zab), _r4(ll), verdict)


def test_lepage_matches_reference(spark, tmp_path):
    a = [100, 120, 120, 150, 170, 200, 200, 230, 260, 300, 180]
    b = [140, 150, 180, 210, 240, 280, 350]
    rows = [("big", x) for x in a] + [("sml", x) for x in b] \
        + [("tiny", 999)]
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_lepage_location_scale(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _lepage_ref(a, b)


def test_lepage_pure_scale_difference(spark, tmp_path):
    # same median, radically different spread: the Ansari arm should
    # carry the statistic while the Wilcoxon arm stays small
    a = [200 + d for d in (-5, -3, -1, 0, 1, 3, 5) for _ in range(3)]
    b = [200 + d for d in (-150, -90, -40, 0, 40, 90, 150)
         for _ in range(2)]
    rows = [("big", x) for x in a] + [("sml", x) for x in b]
    _write_docs_nchars(spark, tmp_path, rows)
    r = q_lepage_location_scale(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _lepage_ref(a, b)
    assert abs(r["z_ansari"]) > abs(r["z_wilcoxon"])
    assert r["verdict"] == "location_or_scale_differ"


# ------------------------------------------------------------------ renyi


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _renyi_ref(texts):
    cnt = Counter(w for t in texts for w in _toks(t))
    n = float(sum(cnt.values()))
    v = float(len(cnt))
    h0 = math.log(v)
    h1 = math.log(n) - sum(f * math.log(f) for f in cnt.values()) / n
    h2 = -math.log(sum(f * f for f in cnt.values()) / (n * n))
    hinf = -math.log(max(cnt.values()) / n)
    return (int(n), int(v), _r4(h0), _r4(h1), _r4(h2), _r4(hinf))


def test_renyi_matches_reference(spark, tmp_path):
    texts = ["the the the quick fox", "the lazy dog dog",
             "quick brown fox jumps", "the dog"]
    _write_docs_text(spark, tmp_path, texts)
    got = q_renyi_entropy_spectrum(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    n, v, h0, h1, h2, hinf = _renyi_ref(texts)
    assert (r["n_tokens"], r["vocab"]) == (n, v)
    assert (r["renyi_h0"], r["shannon_h1"]) == (h0, h1)
    assert (r["collision_h2"], r["min_entropy_hinf"]) == (h2, hinf)
    # Renyi monotonicity: H0 >= H1 >= H2 >= Hinf
    assert h0 >= h1 >= h2 >= hinf


def test_renyi_uniform_spectrum_flat(spark, tmp_path):
    # 8 distinct words once each: all orders equal ln 8
    texts = ["alpha beta gamma delta", "epsilon zeta eta theta"]
    _write_docs_text(spark, tmp_path, texts)
    r = q_renyi_entropy_spectrum(spark, str(tmp_path)).collect()[0]
    ln8 = _r4(math.log(8))
    assert r["renyi_h0"] == r["shannon_h1"] == ln8
    assert r["collision_h2"] == r["min_entropy_hinf"] == ln8
    assert r["effective_vocab_h2"] == 8.0


# ------------------------------------------------------------- bm25 sweep


def _sweep_ref(texts):
    toks = {i + 1: _toks(t) for i, t in enumerate(texts)}
    n_docs = len(texts)
    total = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in _TERMS}
    out = []
    for k1 in _BM25_SWEEP_K1:
        for b in _BM25_SWEEP_B:
            scores = {}
            for d, v in toks.items():
                s, m = 0.0, 0
                for t in _TERMS:
                    tf = v.count(t)
                    if not tf:
                        continue
                    m += 1
                    idf = math.log((n_docs - df[t] + 0.5)
                                   / (df[t] + 0.5) + 1.0)
                    s += idf * (tf * (k1 + 1)) / (
                        tf + k1 * (1 - b + b * len(v) * n_docs / total))
                if m:
                    scores[d] = (_r4(s), m)
            order = sorted(scores,
                           key=lambda d: (-scores[d][0], d))[:10]
            apsum, upto, nrel = 0.0, 0, 0
            for r, d in enumerate(order, 1):
                if scores[d][1] >= 2:
                    upto += 1
                    nrel += 1
                    apsum += upto / r
            out.append((round(k1, 2), round(b, 2), nrel,
                        _r4(apsum / nrel) if nrel else None))
    return out


def test_sweep_matches_reference(spark, tmp_path):
    texts = [
        "spark scan dup pipeline words here",
        ("spark " * 30).strip(),                 # term-stuffed long doc
        "spark scan tight",
        "dup scan pair",
        "dup " + ("filler " * 40).strip(),
        "scan",
        "nothing at all",
        "spark dup mix of words",
    ]
    _write_docs_text(spark, tmp_path, texts)
    got = [tuple(r) for r in
           q_bm25_param_sweep(spark, str(tmp_path)).collect()]
    assert got == _sweep_ref(texts)
    assert len(got) == len(_BM25_SWEEP_K1) * len(_BM25_SWEEP_B)


def test_sweep_b_separates_verbosity(spark, tmp_path):
    # relevant docs are SHORT, stuffed single-term docs are LONG:
    # higher b (length normalization) must not hurt AP
    texts = (["spark scan dup"] * 2
             + ["spark scan here now"]
             + [("spark " * 60).strip()] * 3
             + ["plain filler"] * 2)
    _write_docs_text(spark, tmp_path, texts)
    rows = [tuple(r) for r in
            q_bm25_param_sweep(spark, str(tmp_path)).collect()]
    assert rows == _sweep_ref(texts)
    by = {(k, b): ap for k, b, _, ap in rows}
    for k1 in _BM25_SWEEP_K1:
        assert by[(round(k1, 2), 1.0)] >= by[(round(k1, 2), 0.0)]


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_docs_nchars(spark, tmp_path,
                       [("a", 100 + i * 7) for i in range(14)]
                       + [("b", 160 + i * 9) for i in range(10)])
    for fn, mx in ((q_lepage_location_scale, 1),
                   (q_renyi_entropy_spectrum, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    _write_docs_text(spark, tmp_path,
                     ["spark scan dup", "spark", "plain", "scan dup"])
    plan = q_bm25_param_sweep(spark, str(tmp_path))._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 5
    assert "CartesianProduct" not in plan
