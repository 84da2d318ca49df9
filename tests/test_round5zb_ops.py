"""Round-5 batch-30 operators on crafted inputs, verified against
independent Python computations: query_likelihood_topk (Dirichlet
query-likelihood vs a from-scratch LM scorer incl. the background cost
of missing terms), yule_k_richness (Yule's K / Simpson's D / Herdan's C
vs direct frequency-spectrum arithmetic), variance_ratio_test
(Lo-MacKinlay VR + homoskedastic z vs a sequential implementation).
Plan pins for all three live at the bottom."""

from __future__ import annotations

import datetime as dt
import math
import re
from statistics import variance

from pdf_extractor_spark.queries import (
    _QL_MU,
    q_query_likelihood_topk,
    q_variance_ratio_test,
    q_yule_k_richness,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs(spark, path, rows):
    """rows: (text, lang, source) tuples; n_chars = len(text)."""
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    """rows: (user_id, second_offset, event_type)."""
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


# ----------------------------------------------------- query_likelihood_topk


_QL_TERMS = ("spark", "scan", "dup")


def _ql_expected(texts):
    """(doc_id, score, rank) rows under the op's exact definitions."""
    toks = {i: _toks(t) for i, t in enumerate(texts, 1)}
    total_len = sum(len(ts) for ts in toks.values())
    tf = {
        (i, q): sum(1 for w in ts if w == q)
        for i, ts in toks.items() for q in _QL_TERMS
    }
    cf = {q: max(sum(tf[(i, q)] for i in toks), 1) for q in _QL_TERMS}
    cand = [i for i in toks if any(tf[(i, q)] for q in _QL_TERMS)]
    scored = []
    for i in cand:
        s = sum(
            math.log((tf[(i, q)] + _QL_MU * cf[q] / total_len)
                     / (len(toks[i]) + _QL_MU))
            for q in _QL_TERMS
        )
        scored.append((i, round(s, 4)))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return [(i, s, r) for r, (i, s) in enumerate(scored[:10], 1)]


def test_query_likelihood_matches_python_lm(spark, tmp_path):
    texts = [
        "spark spark spark scan dup filler words here",        # all terms
        "spark " + "pad " * 60,                                 # long, 1 hit
        "scan dup scan dup",                                    # short, dense
        "nothing relevant in this document at all",             # no term
        "dup",                                                  # minimal doc
        "spark scan " + "x " * 10,
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    got = [
        (r.doc_id, r.ql_score, r.rank)
        for r in q_query_likelihood_topk(spark, str(tmp_path)).collect()
    ]
    exp = _ql_expected(texts)
    assert got == exp
    # the no-term document never becomes a candidate
    assert 4 not in {i for i, _, _ in got}
    # every candidate with >= 1 term is present (6 docs, 5 candidates)
    assert len(got) == 5


def test_query_likelihood_missing_term_pays_background(spark, tmp_path):
    """A doc with huge tf on ONE term still pays the background cost on
    the other two: with equal lengths, a doc holding all three terms
    outranks a doc stuffing one."""
    texts = [
        "spark spark spark spark spark pad pad pad",   # stuffed, 1 term
        "spark scan dup pad pad pad pad pad",          # balanced, 3 terms
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    rows = q_query_likelihood_topk(spark, str(tmp_path)).collect()
    assert [r.doc_id for r in rows] == [2, 1]
    assert rows == [
        tuple(r) for r in q_query_likelihood_topk(
            spark, str(tmp_path)).collect()
    ]  # deterministic


def test_query_likelihood_absent_term_stays_finite(spark, tmp_path):
    """'dup' never occurs: its collection frequency floors at 1, so the
    background cost is finite and scores still match Python."""
    texts = ["spark scan pad pad", "scan pad pad pad pad pad"]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    got = [
        (r.doc_id, r.ql_score, r.rank)
        for r in q_query_likelihood_topk(spark, str(tmp_path)).collect()
    ]
    assert got == _ql_expected(texts)
    assert all(math.isfinite(s) for _, s, _ in got)


def test_query_likelihood_top10_cap(spark, tmp_path):
    _write_docs(
        spark, tmp_path,
        [(f"spark filler{i} " + "w " * i, "en", "a") for i in range(14)],
    )
    rows = q_query_likelihood_topk(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert [r.rank for r in rows] == list(range(1, 11))
    scores = [r.ql_score for r in rows]
    assert scores == sorted(scores, reverse=True)


# --------------------------------------------------------- yule_k_richness


def _yule_expected(rows):
    """rows: (text, source) -> {source: (n, v, k, d, c)} per the op."""
    freqs: dict[str, dict[str, int]] = {}
    for text, src in rows:
        f = freqs.setdefault(src, {})
        for w in _toks(text):
            f[w] = f.get(w, 0) + 1
    out = {}
    for src, f in freqs.items():
        n = sum(f.values())
        if n <= 1:
            continue
        v = len(f)
        sumf2 = sum(x * x for x in f.values())
        sumff = sum(x * (x - 1) for x in f.values())
        out[src] = (
            n, v,
            round(10000.0 * (sumf2 - n) / (n * n), 4),
            round(sumff / (n * (n - 1.0)), 6),
            round(math.log(v) / math.log(n), 4),
        )
    return out


def test_yule_k_matches_python_spectrum(spark, tmp_path):
    rows = [
        ("the cat sat on the mat the cat", "a"),
        ("dogs bark dogs bark dogs", "a"),
        ("every word here is completely unique tokens", "b"),
    ]
    _write_docs(spark, tmp_path, [(t, "en", s) for t, s in rows])
    got = {
        r.source: (r.n_tokens, r.vocab, r.yule_k, r.simpson_d, r.herdan_c)
        for r in q_yule_k_richness(spark, str(tmp_path)).collect()
    }
    assert got == _yule_expected(rows)
    # all-distinct source: K = 10^4 (V - N)/N^2 with V = N -> 0, D = 0
    assert got["b"][2] == 0.0
    assert got["b"][3] == 0.0
    # repetitive source scores strictly richer-in-repeats on both
    assert got["a"][2] > got["b"][2]
    assert got["a"][3] > got["b"][3]


def test_yule_k_single_token_source_excluded(spark, tmp_path):
    """A source with N <= 1 has no defined D (0/0) and is dropped by the
    HAVING guard instead of emitting NaN."""
    rows = [("solo", "tiny"), ("the cat the cat", "big")]
    _write_docs(spark, tmp_path, [(t, "en", s) for t, s in rows])
    got = q_yule_k_richness(spark, str(tmp_path)).collect()
    assert [r.source for r in got] == ["big"]
    assert got[0].n_tokens == 4
    assert got[0].vocab == 2


# ------------------------------------------------------ variance_ratio_test


def _vr_expected(day_counts):
    """Sequential VR(q)/z for q in (2, 4) from per-day event counts."""
    xs = [math.log(c) for c in day_counts]
    d1 = [b - a for a, b in zip(xs, xs[1:])]
    v1, n1 = variance(d1), len(d1)
    out = []
    for q in (2, 4):
        dq = [xs[i] - xs[i - q] for i in range(q, len(xs))]
        vr = variance(dq) / (q * v1)
        z = (vr - 1.0) / math.sqrt(
            2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * n1))
        regime = ("mean_reverting" if z < -2.0
                  else "trending" if z > 2.0
                  else "random_walk_consistent")
        out.append((q, n1, round(vr, 4), round(z, 4), regime))
    return out


def _events_for_counts(day_counts):
    rows = []
    for d, c in enumerate(day_counts):
        rows.extend((1, d * 86400 + i, "view") for i in range(c))
    return rows


def test_variance_ratio_matches_python(spark, tmp_path):
    counts = [10, 14, 9, 22, 15, 18, 25, 13, 30, 17, 21, 12]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    got = [tuple(r) for r in
           q_variance_ratio_test(spark, str(tmp_path)).collect()]
    assert got == _vr_expected(counts)


def test_variance_ratio_alternating_series_mean_reverts(spark, tmp_path):
    """A strictly alternating series: q-diffs at even lag cancel, so
    VR(2) and VR(4) collapse toward 0 and the z flags mean reversion."""
    counts = [10, 100] * 10
    _write_events(spark, tmp_path, _events_for_counts(counts))
    rows = {r.q: r for r in
            q_variance_ratio_test(spark, str(tmp_path)).collect()}
    exp = {q: dict(zip(("q", "n1", "vr", "z", "regime"), e))
           for q, e in zip((2, 4), _vr_expected(counts))}
    for q in (2, 4):
        assert rows[q].vr == exp[q]["vr"]
        assert rows[q].vr < 0.2
        assert rows[q].regime == "mean_reverting"


def test_variance_ratio_trending_series(spark, tmp_path):
    """Persistent-run growth (~+10%/day then ~+60%/day): log-diffs are
    positively autocorrelated, so q-diff variance compounds -> VR > 1
    at both horizons and the z flags the trend."""
    counts = [10, 11, 12, 13, 15, 16, 26, 42, 67, 107, 171, 274]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    rows = {r.q: r for r in
            q_variance_ratio_test(spark, str(tmp_path)).collect()}
    exp = _vr_expected(counts)
    assert [tuple(rows[q]) for q in (2, 4)] == exp
    assert rows[4].vr > 1.0
    assert rows[4].regime == "trending"


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_query_likelihood_plan_two_scans(spark):
    """Exactly two corpus passes (stats fold + candidate filter), no
    token Generate, no cartesian product, one ordered top-10."""
    final = _final(q_query_likelihood_topk(spark, SF_DIR))
    assert final.count("Scan parquet") == 2
    assert "Generate" not in final
    assert "CartesianProduct" not in final
    assert "TakeOrderedAndProject" in final


def test_yule_k_single_scan(spark):
    final = _final(q_yule_k_richness(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Generate" in final
    assert "CartesianProduct" not in final


def test_variance_ratio_rides_checkpoint(spark):
    """The three lag windows run over the eagerly checkpointed daily
    fold — zero parquet scans in the returned plan."""
    final = _final(q_variance_ratio_test(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final
