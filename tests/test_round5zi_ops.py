"""Round-5 batch-37 operators on crafted inputs, verified against
independent Python computations: prefix_filter_pairs (PPJoin-style
candidates + relational verify), siegel_repeated_median (50%-breakdown
trend), ams_f2_estimate (±1 sketch vs exact F2, integer-for-integer)."""

from __future__ import annotations

import datetime as dt
import hashlib
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _AMS_SKETCHES,
    _PREFIX_BUCKET_CAP,
    _PREFIX_RARE_K,
    _PREFIX_TAU,
    q_ams_f2_estimate,
    q_prefix_filter_pairs,
    q_siegel_repeated_median,
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


def _low_med(vals, keys=None):
    vs = sorted(vals)
    return vs[(len(vs) - 1) // 2]


# --------------------------------------------------------- prefix_filter_pairs


def _prefix_py(texts):
    sets = {i: set(_toks(t)) for i, t in enumerate(texts, 1) if _toks(t)}
    df: Counter = Counter()
    for s in sets.values():
        df.update(s)
    rare = {}
    for i, s in sets.items():
        rare[i] = {t for _, t in
                   sorted((df[t], t) for t in s)[:_PREFIX_RARE_K]}
    buckets: dict[str, list[int]] = {}
    for i, ts in rare.items():
        for t in ts:
            buckets.setdefault(t, []).append(i)
    cands = set()
    for t, docs in buckets.items():
        if len(docs) > _PREFIX_BUCKET_CAP:
            continue
        for a in docs:
            for b in docs:
                if b > a:
                    cands.add((a, b))
    out = {}
    for a, b in sorted(cands):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        j = i / u
        out[(a, b)] = {"jaccard": round(j, 4),
                       "is_dup": int(j >= _PREFIX_TAU)}
    return out


def test_prefix_pairs_match_python(spark, tmp_path):
    texts = [
        "alpha beta gamma delta rareword1 common common",
        "alpha beta gamma delta rareword1 common extra",   # near-dup of 1
        "totally different content rareword2 here now",
        "totally different content rareword2 here then",   # near-dup of 3
        "common shared words everywhere in all documents",
    ]
    _write_docs(spark, tmp_path, texts)
    want = _prefix_py(texts)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in q_prefix_filter_pairs(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for key, w in want.items():
        assert got[key]["jaccard"] == w["jaccard"]
        assert got[key]["is_dup"] == w["is_dup"]
    # the two planted near-dup pairs are candidates AND verified
    assert got[(1, 2)]["is_dup"] == 1
    assert got[(3, 4)]["is_dup"] == 1


def test_prefix_pairs_identical_docs_always_candidates(spark, tmp_path):
    # zero-false-negative sanity: exact duplicates share every rare
    # token, so they cannot be missed by the prefix filter
    texts = ["one two three four five six"] * 2 + [
        "seven eight nine ten eleven twelve"]
    _write_docs(spark, tmp_path, texts)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in q_prefix_filter_pairs(spark, str(tmp_path)).collect()}
    assert (1, 2) in got
    assert got[(1, 2)]["jaccard"] == 1.0 and got[(1, 2)]["is_dup"] == 1


# ------------------------------------------------------ siegel_repeated_median


def _siegel_py(counts):
    y = [float(c) for c in counts]
    n = len(y)
    inner = []
    for i in range(n):
        slopes = [(y[j] - y[i]) / (j - i) for j in range(n) if j != i]
        inner.append(_low_med(slopes))
    b = _low_med(inner)
    a = _low_med([y[i] - b * i for i in range(n)])
    return round(b, 6), round(a, 6)


def test_siegel_matches_python_and_survives_heavy_contamination(
        spark, tmp_path):
    clean = [3 + 2 * i for i in range(12)]
    counts = list(clean)
    for bad in (1, 4, 6, 9, 11):       # 5 of 12 days corrupted
        counts[bad] += 1000
    _write_daily_counts(spark, tmp_path, counts)
    b, a = _siegel_py(counts)
    r = q_siegel_repeated_median(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 12
    assert r["siegel_slope"] == b
    assert r["intercept"] == a
    # with 42% of days corrupted the repeated median still reads the
    # underlying slope-2 line
    assert abs(r["siegel_slope"] - 2.0) < 0.6


def test_siegel_exact_line(spark, tmp_path):
    _write_daily_counts(spark, tmp_path, [7 + 3 * i for i in range(9)])
    r = q_siegel_repeated_median(spark, str(tmp_path)).collect()[0]
    assert r["siegel_slope"] == 3.0
    assert r["intercept"] == 7.0


# ------------------------------------------------------------- ams_f2_estimate


def _ams_py(texts):
    cnt: Counter = Counter()
    for t in texts:
        cnt.update(_toks(t))
    f2 = sum(c * c for c in cnt.values())
    ests = []
    for r in range(_AMS_SKETCHES):
        z = sum((1 - 2 * (_md5int(f"ams:{r}:{t}") % 2)) * c
                for t, c in cnt.items())
        ests.append((z * z, r))
    ests.sort()
    ams = ests[(len(ests) - 1) // 2][0]
    return {
        "n_tokens": sum(cnt.values()),
        "distinct_tokens": len(cnt),
        "f2_exact": f2,
        "ams_estimate": ams,
        "rel_err": round(abs(ams - f2) / f2, 4),
        "n_sketches": _AMS_SKETCHES,
    }


def test_ams_matches_python_exactly(spark, tmp_path):
    texts = ["the cat sat on the mat " * 4,
             "a very different set of words here",
             "the the the repeated token heavy doc"]
    _write_docs(spark, tmp_path, texts)
    want = _ams_py(texts)
    r = q_ams_f2_estimate(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)


def test_ams_single_token_corpus_is_exact(spark, tmp_path):
    # one distinct token: every sketch row is (+-c)^2 = c^2 = F2 exactly
    _write_docs(spark, tmp_path, ["tok tok tok tok tok"])
    r = q_ams_f2_estimate(spark, str(tmp_path)).collect()[0]
    assert r["f2_exact"] == 25
    assert r["ams_estimate"] == 25
    assert r["rel_err"] == 0.0
