"""Round-5 batch-42 operators on crafted inputs, verified against
independent Python computations: idf_weighted_jaccard (boilerplate
down-weighting incl. the all-boilerplate degenerate pair),
hodges_lehmann_daily (Walsh-average pseudo-median), filter_order_plan
(exact short-circuit costs over all 24 orders)."""

from __future__ import annotations

import dataclasses
import datetime as dt
import itertools
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _FILTER_PLAN_DEFS,
    q_filter_order_plan,
    q_hodges_lehmann_daily,
    q_idf_weighted_jaccard,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append(
                (eid, _EPOCH + dt.timedelta(days=d, seconds=i), 1,
                 "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# -------------------------------------------------------- idf_weighted_jaccard


def _idfj_py(texts):
    sets = {i: set(_toks(t)) for i, t in enumerate(texts, 1) if _toks(t)}
    nd = len(sets)
    df: Counter = Counter()
    for s in sets.values():
        df.update(s)
    w = {t: math.log(nd / c) for t, c in df.items()}
    out = {}
    for a in sorted(sets):
        b = a + 1
        if b not in sets:
            continue
        inter = sets[a] & sets[b]
        i, u = len(inter), len(sets[a] | sets[b])
        jp = i / u
        wi = sum(w[t] for t in inter)
        wu = sum(w[t] for t in sets[a]) + sum(w[t] for t in sets[b]) - wi
        ji = wi / wu if wu != 0 else None
        out[(a, b)] = {
            "jaccard_plain": round(jp, 4),
            "jaccard_idf": round(ji, 4) if ji is not None else None,
            "idf_minus_plain": (round(ji - jp, 4)
                                if ji is not None else None),
        }
    return out


def test_idf_jaccard_discounts_boilerplate(spark, tmp_path):
    bp = "header footer nav copyright"   # appears in EVERY doc
    texts = [
        f"{bp} unique alpha beta gamma",
        f"{bp} totally different delta epsilon",   # shares ONLY boilerplate
        f"{bp} rare shared content zeta eta",
        f"{bp} rare shared content zeta theta",    # real near-dup
    ]
    _write_docs(spark, tmp_path, texts)
    want = _idfj_py(texts)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in q_idf_weighted_jaccard(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for key, wv in want.items():
        for k, v in wv.items():
            assert got[key][k] == v, (key, k, got[key][k], v)
    # boilerplate-only overlap: plain sees similarity, IDF sees none
    assert got[(1, 2)]["jaccard_plain"] > 0.3
    assert got[(1, 2)]["jaccard_idf"] == 0.0


def test_idf_jaccard_boosts_rare_shared_content(spark, tmp_path):
    # docs 3 and 4 share RARE tokens (df=2) and differ only on tokens
    # that also appear elsewhere (df=3, low weight): the IDF similarity
    # must exceed the plain one
    texts = [
        "common1 common2 common3 common4 alpha",
        "common1 common2 common3 common4 beta",
        "sharedrare1 sharedrare2 common1 common2",
        "sharedrare1 sharedrare2 common3 common4",
    ]
    _write_docs(spark, tmp_path, texts)
    want = _idfj_py(texts)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in q_idf_weighted_jaccard(spark, str(tmp_path)).collect()}
    for key, wv in want.items():
        for k, v in wv.items():
            assert got[key][k] == v, (key, k, got[key][k], v)
    assert got[(3, 4)]["idf_minus_plain"] > 0.1


def test_idf_jaccard_all_boilerplate_pair_is_null(spark, tmp_path):
    texts = ["common words here", "common words here",
             "common words here also extra"]
    # tokens 'common words here' are in all 3 docs -> weight 0; the
    # (1,2) pair consists ONLY of zero-weight tokens -> undefined ratio
    _write_docs(spark, tmp_path, texts)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in q_idf_weighted_jaccard(spark, str(tmp_path)).collect()}
    assert got[(1, 2)]["jaccard_plain"] == 1.0
    assert got[(1, 2)]["jaccard_idf"] is None


# -------------------------------------------------------- hodges_lehmann_daily


def _hl_py(counts):
    y = [float(c) for c in counts]
    n = len(y)
    walsh = sorted((y[i] + y[j]) / 2
                   for i in range(n) for j in range(i, n))
    hl = walsh[(len(walsh) - 1) // 2]
    med = sorted(counts)[(n - 1) // 2]
    return {
        "n_days": n,
        "hl_location": round(hl, 4),
        "mean_daily": round(sum(y) / n, 4),
        "median_daily": med,
        "hl_minus_mean": round(hl - sum(y) / n, 4),
    }


def test_hl_matches_python_and_resists_spikes(spark, tmp_path):
    counts = [8, 9, 10, 11, 12, 10, 9, 300, 11, 10]
    _write_daily_counts(spark, tmp_path, counts)
    want = _hl_py(counts)
    r = q_hodges_lehmann_daily(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    # the 300-spike drags the mean ~29 points; HL stays near the bulk
    assert abs(r["hl_location"] - 10) < 3
    assert r["hl_minus_mean"] < -20


def test_hl_symmetric_series_equals_mean(spark, tmp_path):
    counts = [6, 8, 10, 12, 14]
    _write_daily_counts(spark, tmp_path, counts)
    r = q_hodges_lehmann_daily(spark, str(tmp_path)).collect()[0]
    assert r["hl_location"] == 10.0
    assert r["mean_daily"] == 10.0
    assert r["median_daily"] == 10


# ------------------------------------------------------------ filter_order_plan


def _filter_plan_py(texts):
    costs = [c for _, c in _FILTER_PLAN_DEFS]
    names = [n for n, _ in _FILTER_PLAN_DEFS]
    cells: Counter = Counter()
    for t in texts:
        punct = len(re.findall(r"[.!?,;:]", t))
        bits = (
            int(len(t) >= 200),
            int(len(t) <= 50000),
            int(0.005 <= punct / max(len(t), 1) <= 0.2),
            int(len(_toks(t)) >= 50),
        )
        cells[bits] += 1
    n = sum(cells.values())
    plans = {}
    for perm in itertools.permutations(range(4)):
        ev = 0
        for bits, c in cells.items():
            e = 0
            alive = 1
            for p in perm:
                if not alive:
                    break
                e += costs[p]
                alive = bits[p]
            ev += c * e
        label = " > ".join(names[p] for p in perm)
        plans[label] = ev
    best = min(plans.values())
    return {label: {"cost_per_doc": round(ev / n, 4),
                    "vs_best": round(ev / best, 4)}
            for label, ev in plans.items()}, n


def test_filter_plan_exact_costs_all_24_orders(spark, tmp_path):
    texts = []
    for i in range(60):
        body = " ".join(f"w{j}" for j in range(10 + 5 * (i % 12)))
        # vary punctuation and length so every filter has mixed outcomes
        t = (body + ("." if i % 3 else "")) * (1 + i % 4)
        if i % 5 == 0:
            t = t[:100]                  # too short for len_min
        texts.append(t)
    _write_docs(spark, tmp_path, texts)
    want, n = _filter_plan_py(texts)
    rows = q_filter_order_plan(spark, str(tmp_path)).collect()
    assert len(rows) == 24
    got = {r["plan_order"]: r for r in rows}
    assert set(got) == set(want)
    for label, w in want.items():
        assert got[label]["cost_per_doc"] == w["cost_per_doc"], label
        assert got[label]["vs_best"] == w["vs_best"], label
    ranked = sorted(rows, key=lambda r: r["rnk"])
    assert ranked[0]["vs_best"] == 1.0
    costs = [r["cost_per_doc"] for r in ranked]
    assert costs == sorted(costs)


def test_filter_plan_rank1_drops_cheap_rejector_first(spark, tmp_path):
    # every doc fails len_min (cost 1, kills everything): any optimal
    # plan must run it first
    texts = ["tiny." for _ in range(30)]
    _write_docs(spark, tmp_path, texts)
    rows = sorted(q_filter_order_plan(spark, str(tmp_path)).collect(),
                  key=lambda r: r["rnk"])
    assert rows[0]["plan_order"].startswith("len_min")
    assert rows[0]["cost_per_doc"] == 1.0
