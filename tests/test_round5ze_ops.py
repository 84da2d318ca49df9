"""Round-5 batch-33 operators on crafted inputs, verified against
independent Python computations: pr_curve_ap (stepwise AP + best-F1
operating point), poisson_gap_check (pooled normalized-gap KS with a
closed-form degenerate case), bbit_minhash_error (1-bit vs full minhash
vs exact Jaccard, bit-for-bit)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    _BBIT_PERMS,
    _MH_PRIME,
    q_bbit_minhash_error,
    q_poisson_gap_check,
    q_pr_curve_ap,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_user_times(spark, path, user_times):
    rows = []
    eid = 0
    for u, times in user_times.items():
        for s in times:
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=s), u,
                         "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ----------------------------------------------------------------- pr_curve_ap


def _score_docs(texts):
    """(doc_id, prob, ok) under the op's exact signal definitions."""
    out = []
    for i, t in enumerate(texts, 1):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000 for w in toks)
        prob = round(
            1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(toks), 1)))), 4)
        punct = len(re.findall(r"[.!?,;:]", t))
        ok = (200 <= len(t) <= 50000
              and 0.005 <= punct / max(len(t), 1) <= 0.2)
        out.append((i, prob, ok))
    return out


def _pr_expect(texts):
    scored = sorted(_score_docs(texts), key=lambda r: (-r[1], r[0]))
    n = len(scored)
    npos = sum(1 for _, _, ok in scored if ok)
    cum = 0
    ap = 0.0
    best = None
    for k, (_, prob, ok) in enumerate(scored, 1):
        cum += int(ok)
        if ok:
            ap += cum / k
        f1 = 2.0 * cum / (k + npos)
        if best is None or f1 > best[0]:
            best = (f1, k, prob)
    return {
        "n_docs": n, "n_pos": npos,
        "prevalence": round(npos / n, 4),
        "average_precision": round(ap / npos, 4) if npos else None,
        "best_f1": round(best[0], 4),
        "best_f1_k": best[1],
        "best_f1_threshold": best[2],
    }


def _pr_texts():
    texts = []
    for i in range(30):
        words = [f"tok{i}x{j}" for j in range(5 + i % 7)]
        body = " ".join(words)
        reps = 10 if i % 3 else 2   # every 3rd doc is too short -> ok=False
        texts.append((body + ". " + body.upper() + ",") * reps)
    return texts


def test_pr_curve_matches_python(spark, tmp_path):
    texts = _pr_texts()
    _write_docs(spark, tmp_path, texts)
    want = _pr_expect(texts)
    labels = {ok for _, _, ok in _score_docs(texts)}
    assert labels == {True, False}  # the fixture has both classes
    r = q_pr_curve_ap(spark, str(tmp_path)).collect()[0]
    for k2, v in want.items():
        assert r[k2] == v, (k2, r[k2], v)
    assert 0.0 <= r["average_precision"] <= 1.0
    assert r["best_f1"] >= r["prevalence"]  # F1 of all-keep >= trivial


# ----------------------------------------------------------- poisson_gap_check


def _poisson_expect(user_times):
    us = []
    for times in user_times.values():
        ts = sorted(times)
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if not gaps:
            continue
        mg = sum(gaps) / len(gaps)
        if mg > 0:
            us.extend(g / mg for g in gaps)
    from collections import Counter
    cnt = sorted(Counter(us).items())
    n = len(us)
    cum = 0
    d = 0.0
    for u, c in cnt:
        f = 1 - math.exp(-u)
        d = max(d, abs((cum + c) / n - f), abs(f - cum / n))
        cum += c
    crit = 1.358 / math.sqrt(n)
    return {"n_gaps": n, "ks_d": round(d, 4), "ks_crit": round(crit, 4),
            "exponential_plausible": int(round(d, 4) <= round(crit, 4))}


def test_poisson_gap_matches_python(spark, tmp_path):
    # deterministic pseudo-exponential-ish gaps per user, integer seconds
    user_times = {}
    for u in range(1, 6):
        t, times = 0, [0]
        for j in range(40):
            t += 1 + (_md5int(f"g:{u}:{j}") % 600)
            times.append(t)
        user_times[u] = times
    _write_user_times(spark, tmp_path, user_times)
    want = _poisson_expect(user_times)
    r = q_poisson_gap_check(spark, str(tmp_path)).collect()[0]
    for k2, v in want.items():
        assert r[k2] == v, (k2, r[k2], v)


def test_poisson_gap_regular_arrivals_rejected(spark, tmp_path):
    # metronome arrivals: all normalized gaps are exactly 1 ->
    # D = max(e^-1, 1 - e^-1) = 0.6321, decisively non-exponential
    user_times = {1: list(range(0, 600, 30)), 2: list(range(0, 900, 45))}
    _write_user_times(spark, tmp_path, user_times)
    r = q_poisson_gap_check(spark, str(tmp_path)).collect()[0]
    assert r["ks_d"] == round(1 - math.exp(-1), 4)
    assert r["exponential_plausible"] == 0


# ---------------------------------------------------------- bbit_minhash_error


def _shingles(text):
    toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    if not toks:
        return None
    if len(toks) >= 3:
        return [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    return [" ".join(toks)]


def _bbit_expect(texts):
    rows = {}
    per_doc = {}
    for i, t in enumerate(texts, 1):
        sh = _shingles(t)
        if sh is None:
            continue
        hs = [_md5int(s) for s in sh]
        sig = [min((a * h + b) % _MH_PRIME for h in hs)
               for a, b in _BBIT_PERMS]
        per_doc[i] = (set(sh), sig)
    k = len(_BBIT_PERMS)
    for i in per_doc:
        if i + 1 not in per_doc:
            continue
        (ga, sa), (gb, sb) = per_doc[i], per_doc[i + 1]
        u = len(ga | gb)
        if u == 0:
            continue
        j = len(ga & gb) / u
        mf = sum(1 for x, y in zip(sa, sb) if x == y)
        mb = sum(1 for x, y in zip(sa, sb) if x % 2 == y % 2)
        e1 = max(0.0, 2.0 * mb / k - 1)
        rows[(i, i + 1)] = {
            "jaccard": round(j, 4),
            "est_full": round(mf / k, 4),
            "est_1bit": round(e1, 4),
            "err_full": round(mf / k - j, 4),
            "err_1bit": round(e1 - j, 4),
        }
    return rows


def test_bbit_matches_python_reference(spark, tmp_path):
    same = "the quick brown fox jumps over the lazy dog today"
    half = "the quick brown fox leaps over a sleepy dog tonight"
    other = "completely different content with no shared trigrams at all"
    texts = [same, same, half, other]
    _write_docs(spark, tmp_path, texts)
    want = _bbit_expect(texts)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in q_bbit_minhash_error(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for key, w in want.items():
        for k2, v in w.items():
            assert got[key][k2] == v, (key, k2, got[key][k2], v)
    # identical docs: every estimator is exact
    assert got[(1, 2)]["jaccard"] == 1.0
    assert got[(1, 2)]["est_full"] == 1.0
    assert got[(1, 2)]["est_1bit"] == 1.0
    assert got[(1, 2)]["err_full"] == 0.0
