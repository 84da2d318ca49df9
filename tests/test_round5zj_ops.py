"""Round-5 batch-38 operators on crafted inputs, verified against
independent Python computations: sampled_topk_fidelity (heavy-hitter
recovery from the 5% hash sample), distance_correlation_daily (Székely
dCor incl. the non-monotone case Pearson misses), markov_order_test
(conditional entropies + LR statistic on planted 1st/2nd-order
chains)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _HT_SAMPLE_MOD,
    _TOPK_FID_K,
    q_distance_correlation_daily,
    q_markov_order_test,
    q_sampled_topk_fidelity,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


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


def _write_user_seqs(spark, path, user_seqs):
    rows, eid = [], 0
    for u, seq in user_seqs.items():
        for j, et in enumerate(seq):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=1000 * u + j),
                         u, et, 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# -------------------------------------------------------- sampled_topk_fidelity


def _topk_fid_py(texts):
    full: Counter = Counter()
    samp: Counter = Counter()
    for i, t in enumerate(texts, 1):
        ws = _toks(t)
        full.update(ws)
        if _md5int(str(i)) % _HT_SAMPLE_MOD == 0:
            samp.update(ws)
    k = _TOPK_FID_K
    ftop = [t for _, t in sorted(((-c, t) for t, c in full.items()))[:k]]
    stop_ = [t for _, t in sorted(((-c, t) for t, c in samp.items()))[:k]]
    fset, sset = set(ftop), set(stop_)
    hit = fset & sset
    top_mass = sum(full[t] for t in fset)
    hit_mass = sum(full[t] for t in hit)
    return {
        "k": k,
        "overlap": len(hit),
        "topk_jaccard": round(len(hit) / len(fset | sset), 4),
        "exact_mass_recovered": round(hit_mass / top_mass, 4),
    }


def test_topk_fidelity_matches_python(spark, tmp_path):
    texts = []
    for i in range(1, 81):
        ws = [f"common{j}" for j in range(8)]          # shared heavy mass
        ws += [f"rare{i}x{j}" for j in range(3)]       # per-doc tail
        texts.append(" ".join(ws * (1 + i % 3)))
    _write_docs(spark, tmp_path, texts)
    want = _topk_fid_py(texts)
    sampled = [i for i in range(1, 81)
               if _md5int(str(i)) % _HT_SAMPLE_MOD == 0]
    assert sampled, "fixture must contain sampled docs"
    r = q_sampled_topk_fidelity(spark, str(tmp_path)).collect()[0]
    for k2, v in want.items():
        assert r[k2] == v, (k2, r[k2], v)
    # the 8 shared heavy tokens dominate every sampled doc too
    assert r["exact_mass_recovered"] > 0.5


# ---------------------------------------------------- distance_correlation_daily


def _dcor_py(counts):
    y = [float(c) for c in counts]
    n = len(y)
    x = list(range(n))

    def centered(vals):
        d = [[abs(vals[i] - vals[j]) for j in range(n)] for i in range(n)]
        rm = [sum(row) / n for row in d]
        cm = [sum(d[i][j] for i in range(n)) / n for j in range(n)]
        g = sum(map(sum, d)) / (n * n)
        return [[d[i][j] - rm[i] - cm[j] + g for j in range(n)]
                for i in range(n)]

    a = centered([float(v) for v in x])
    b = centered(y)
    dcov2 = sum(a[i][j] * b[i][j] for i in range(n)
                for j in range(n)) / (n * n)
    dvx = sum(v * v for row in a for v in row) / (n * n)
    dvy = sum(v * v for row in b for v in row) / (n * n)
    if dvx * dvy <= 0:
        return 0.0
    return round(math.sqrt(max(dcov2, 0.0) / math.sqrt(dvx * dvy)), 4)


def test_dcor_v_shape_beats_pearson(spark, tmp_path):
    counts = [20, 15, 10, 5, 2, 5, 10, 15, 20]   # perfect V: r ~ 0
    _write_daily_counts(spark, tmp_path, counts)
    r = q_distance_correlation_daily(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 9
    assert r["dcor"] == _dcor_py(counts)
    assert abs(r["pearson_r"]) < 0.1
    assert r["dcor"] > 0.3          # the dependence IS there


def test_dcor_linear_series_is_one(spark, tmp_path):
    counts = [3 + 4 * i for i in range(8)]
    _write_daily_counts(spark, tmp_path, counts)
    r = q_distance_correlation_daily(spark, str(tmp_path)).collect()[0]
    assert r["dcor"] == 1.0
    assert r["pearson_r"] == 1.0


# ------------------------------------------------------------ markov_order_test


def _markov_py(user_seqs):
    tri: Counter = Counter()
    for seq in user_seqs.values():
        for a, b, c in zip(seq, seq[1:], seq[2:]):
            tri[(a, b, c)] += 1
    n = sum(tri.values())

    def fold(counter):
        return sum(c * math.log(c) for c in counter.values())

    ctx2: Counter = Counter()
    p12: Counter = Counter()
    ctx1: Counter = Counter()
    states = set()
    for (a, b, c), k in tri.items():
        ctx2[(a, b)] += k
        p12[(b, c)] += k
        ctx1[b] += k
        states.add(c)
    m = len(states)
    h1 = (fold(ctx1) - fold(p12)) / n / math.log(2)
    h2 = (fold(ctx2) - fold(tri)) / n / math.log(2)
    g2 = 2.0 * n * (h1 - h2) * math.log(2)
    df = m * (m - 1) * (m - 1)
    crit = None
    if df > 0:
        crit = df * (1 - 2.0 / (9 * df)
                     + 1.6449 * math.sqrt(2.0 / (9 * df))) ** 3
    return {
        "n_trigrams": n, "n_states": m,
        "h_order1_bits": round(h1, 4),
        "h_order2_bits": round(h2, 4),
        "info_gain_bits": round(h1 - h2, 4),
        "g2_stat": round(g2, 4),
        "df": df,
        "chi2_crit_5pct": round(crit, 4) if crit is not None else None,
        "second_order_needed": int(crit is not None and g2 > crit),
    }


def test_markov_first_order_chain_no_gain(spark, tmp_path):
    # deterministic cycle a->b->c->a: knowing one step already tells all
    seqs = {u: ["a", "b", "c"] * 30 for u in range(1, 4)}
    _write_user_seqs(spark, tmp_path, seqs)
    want = _markov_py(seqs)
    r = q_markov_order_test(spark, str(tmp_path)).collect()[0]
    for k2, v in want.items():
        assert r[k2] == v, (k2, r[k2], v)
    assert r["h_order1_bits"] == 0.0
    assert r["info_gain_bits"] == 0.0
    assert r["second_order_needed"] == 0


def test_markov_second_order_pattern_detected(spark, tmp_path):
    # a a b b a a b b: the next symbol depends on TWO steps of history
    # (after 'a b' comes b; after 'b b' comes a) while one step is 50/50
    seqs = {u: ["a", "a", "b", "b"] * 40 for u in range(1, 4)}
    _write_user_seqs(spark, tmp_path, seqs)
    want = _markov_py(seqs)
    r = q_markov_order_test(spark, str(tmp_path)).collect()[0]
    for k2, v in want.items():
        assert r[k2] == v, (k2, r[k2], v)
    # one step of history: a near-perfect coin flip (finite-sample
    # boundary trigrams shave the last 1e-4 bit)
    assert 0.99 <= r["h_order1_bits"] <= 1.0
    assert r["h_order2_bits"] == 0.0   # two steps: fully determined
    assert r["second_order_needed"] == 1
