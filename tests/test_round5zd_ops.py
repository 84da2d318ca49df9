"""Round-5 batch-32 operators on crafted inputs, verified against
independent Python computations: rbp_eval (rank-biased precision over a
from-scratch BM25 ranking incl. the residual band), l_moments_daily_load
(PWM b0..b3 -> L-ratios -> Hosking GEV shape vs direct order-statistic
sums), markov_attribution (12-step absorbing-chain removal effects vs a
sequential dict-algebra chain walk).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import math
import re

from pdf_extractor_spark.queries import (
    _BM25_B,
    _BM25_K1,
    _MA_K,
    _RBP_DEPTH,
    _RBP_P,
    q_l_moments_daily_load,
    q_markov_attribution,
    q_rbp_eval,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs(spark, path, rows):
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


# ------------------------------------------------------------------ rbp_eval


def _rbp_expected(texts, terms=("spark", "scan", "dup")):
    docs = {i: _toks(t) for i, t in enumerate(texts, 1)}
    n = len(docs)
    total = sum(len(v) for v in docs.values())
    df = {q: sum(1 for ts in docs.values() if q in ts) for q in terms}
    scored = []
    for i, ts in docs.items():
        s = 0.0
        matched = 0
        for q in terms:
            tf = ts.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * (tf * (_BM25_K1 + 1.0)) / (
                tf + _BM25_K1
                * (1.0 - _BM25_B + _BM25_B * len(ts) * n / total)
            )
        if matched:
            scored.append((i, round(s, 4), matched))
    scored.sort(key=lambda r: (-r[1], r[0]))
    scored = scored[:_RBP_DEPTH]
    rbp = (1.0 - _RBP_P) * sum(
        (m / 3.0) * _RBP_P ** r for r, (_, _, m) in enumerate(scored))
    residual = _RBP_P ** _RBP_DEPTH
    return (_RBP_DEPTH, _RBP_P, round(rbp, 4), round(residual, 4),
            round(rbp + residual, 4))


def test_rbp_matches_python(spark, tmp_path):
    texts = [
        "spark scan dup all three terms present here",
        "spark spark spark heavy single term " + "pad " * 5,
        "scan dup two of three terms",
        "no relevant material at all in this one",
        "dup " + "filler " * 20,
        "spark scan " + "x " * 8,
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    rows = q_rbp_eval(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert tuple(rows[0]) == _rbp_expected(texts)


def test_rbp_perfect_prefix_approaches_upper_bound(spark, tmp_path):
    """All candidates contain all three terms: rel = 1 everywhere, so
    rbp = (1-p)*sum(p^(i-1)) = 1 - p^n_cand and rbp_upper folds the
    residual back to exactly 1 - p^depth + p^depth = 1 when the
    candidate list fills the depth."""
    texts = [f"spark scan dup doc{i} " + "w " * i for i in range(25)]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    r = q_rbp_eval(spark, str(tmp_path)).collect()[0]
    assert r.rbp == round(1.0 - _RBP_P ** _RBP_DEPTH, 4)
    assert r.rbp_upper == 1.0


# ---------------------------------------------------- l_moments_daily_load


def _lmom_expected(day_counts):
    xs = sorted(float(c) for c in day_counts)
    n = float(len(xs))
    b0 = sum(xs) / n
    b1 = sum(x * (i - 1) / (n - 1) for i, x in enumerate(xs, 1)) / n
    b2 = sum(x * (i - 1) * (i - 2) / ((n - 1) * (n - 2))
             for i, x in enumerate(xs, 1)) / n
    b3 = sum(x * (i - 1) * (i - 2) * (i - 3)
             / ((n - 1) * (n - 2) * (n - 3))
             for i, x in enumerate(xs, 1)) / n
    l1, l2 = b0, 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    c = (2 * b1 - b0) / (3 * b2 - b0) - math.log(2.0) / math.log(3.0)
    k = 7.8590 * c + 2.9554 * c * c
    family = ("bounded_weibull_tail" if k > 0.05
              else "heavy_frechet_tail" if k < -0.05
              else "gumbel_like")
    return (int(n), round(l1, 2), round(l2 / l1, 4), round(l3 / l2, 4),
            round(l4 / l2, 4), round(k, 4), family)


def _events_for_counts(day_counts):
    rows = []
    for d, c in enumerate(day_counts):
        rows.extend((1, d * 86400 + i, "view") for i in range(c))
    return rows


def test_l_moments_match_python(spark, tmp_path):
    counts = [12, 19, 7, 30, 22, 15, 41, 9, 26, 18]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    rows = q_l_moments_daily_load(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert tuple(rows[0]) == _lmom_expected(counts)


def test_l_moments_heavy_tail_flagged(spark, tmp_path):
    """One enormous spike day in an otherwise flat series drags t3 up
    and the PWM shape negative: Frechet-heavy verdict."""
    counts = [10, 11, 10, 12, 11, 10, 11, 12, 10, 500]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    r = q_l_moments_daily_load(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _lmom_expected(counts)
    assert r.t3_lskew > 0.5
    assert r.tail_family == "heavy_frechet_tail"


# ------------------------------------------------------- markov_attribution


def _ma_expected(paths):
    """paths: list of event-type lists per user (raw, pre-truncation).
    Returns the op's output rows."""
    edges: dict[tuple, float] = {}

    def bump(a, b):
        edges[(a, b)] = edges.get((a, b), 0.0) + 1.0

    for p in paths:
        if "purchase" in p:
            p = p[: p.index("purchase") + 1]
            conv = True
        else:
            conv = False
        prev = "start"
        for e in p:
            bump(prev, "conv" if e == "purchase" else e)
            prev = e
        if not conv:
            bump(p[-1], "null")
    channels = sorted({t for _, t in edges if t not in ("conv", "null")})

    def pconv(removed):
        red: dict[tuple, float] = {}
        for (a, b), c in edges.items():
            b2 = "null" if b == removed else b
            red[(a, b2)] = red.get((a, b2), 0.0) + c
        out_tot: dict[str, float] = {}
        for (a, _), c in red.items():
            out_tot[a] = out_tot.get(a, 0.0) + c
        prob = {(a, b): c / out_tot[a] for (a, b), c in red.items()}
        prob[("conv", "conv")] = 1.0
        prob[("null", "null")] = 1.0
        v = {"start": 1.0}
        for _ in range(_MA_K):
            nv: dict[str, float] = {}
            for (a, b), pr in prob.items():
                if a in v:
                    nv[b] = nv.get(b, 0.0) + v[a] * pr
            v = nv
        return v.get("conv", 0.0)

    pfull = pconv(None)
    res = []
    for c in channels:
        pc = pconv(c)
        res.append((c, pc, max(0.0, 1.0 - pc / pfull)))
    tot = sum(re for _, _, re in res)
    return [
        (c, round(pfull, 4), round(pc, 4), round(re, 4),
         round(re / tot, 4) if tot else None)
        for c, pc, re in res
    ]


_MA_PATHS = [
    ["view", "click", "purchase"],
    ["view", "purchase"],
    ["click", "error"],                      # never converts
    ["view", "click", "view", "purchase"],
    ["error"],                               # never converts
    ["click", "purchase"],
    ["purchase", "view", "view"],            # post-purchase tail ignored
]


def _ma_rows():
    rows = []
    for u, path in enumerate(_MA_PATHS, 1):
        rows.extend((u, u * 10000 + i, et) for i, et in enumerate(path))
    return rows


def test_markov_attribution_matches_python(spark, tmp_path):
    _write_events(spark, tmp_path, _ma_rows())
    got = [tuple(r) for r in
           q_markov_attribution(spark, str(tmp_path)).collect()]
    assert got == _ma_expected(_MA_PATHS)


def test_markov_attribution_semantics(spark, tmp_path):
    _write_events(spark, tmp_path, _ma_rows())
    rows = {r.channel: r for r in
            q_markov_attribution(spark, str(tmp_path)).collect()}
    assert set(rows) == {"view", "click", "error"}
    # error appears only on non-converting paths: removing it changes
    # nothing about conversion
    assert rows["error"].removal_effect == 0.0
    # view gates 3 of 5 conversions, click 2-3: both essential, view >=
    assert rows["view"].removal_effect > 0
    assert rows["click"].removal_effect > 0
    # attribution shares over the effective channels sum to ~1
    total = sum(r.attribution_share for r in rows.values())
    assert abs(total - 1.0) < 0.001
    # post-purchase events contributed no edges: p_conv_full reflects
    # 5/7 converters exactly at the horizon (all paths absorb fast)
    assert abs(rows["view"].p_conv_full - 5.0 / 7.0) < 0.01


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_rbp_plan_bounded(spark):
    """Same bound as the mrr_eval pin: the bm25 scoring lineage re-reads
    the cheap 2-column projection a bounded number of times (each read
    IN-filters to query-matched postings before any shuffle); no
    cartesian products anywhere."""
    final = _final(q_rbp_eval(spark, SF_DIR))
    assert final.count("Scan parquet") <= 6
    assert "CartesianProduct" not in final


def test_l_moments_single_scan(spark):
    final = _final(q_l_moments_daily_load(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_markov_attribution_rides_checkpoints(spark):
    """12 unrolled steps + attribution fold run over the checkpointed
    edge/matrix tables — the returned plan touches no parquet."""
    final = _final(q_markov_attribution(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final
