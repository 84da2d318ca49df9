"""Round-5 batch-40 operators on crafted inputs, verified against
independent Python computations: cum_sqrt_f_strata (Dalenius-Hodges
cuts + Neyman allocation), binned_mi_length_quality (MI identities +
Miller-Madow), km_greenwood_ci (Greenwood bands)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _STRATA_BUDGET,
    _STRATA_K,
    q_binned_mi_length_quality,
    q_cum_sqrt_f_strata,
    q_km_greenwood_ci,
)

_EPOCH = dt.datetime(1970, 1, 1)
_WEEK = 604800


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_docs_nchars(spark, path, vals):
    spark.createDataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate(vals, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_user_weeks(spark, path, user_weeks):
    rows, eid = [], 0
    for u, weeks in user_weeks.items():
        for w in weeks:
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=w * _WEEK + u),
                         u, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------ cum_sqrt_f_strata


def _strata_py(vals):
    hist = sorted(Counter(vals).items())
    q = sum(math.sqrt(c) for _, c in hist)
    strata: dict[int, list[int]] = {}
    cum = 0.0
    for v, c in hist:
        h = min(_STRATA_K - 1, int(math.floor(_STRATA_K * cum / q)))
        cum += math.sqrt(c)
        strata.setdefault(h, []).extend([v] * c)
    out = {}
    shares = {}
    tot_ns = 0.0
    for h, vs in strata.items():
        n = len(vs)
        mean = sum(vs) / n
        var = max(sum(x * x for x in vs) / n - mean * mean, 0.0)
        sd = math.sqrt(var)
        out[h] = {"chars_lo": min(vs), "chars_hi": max(vs),
                  "n_docs": n, "mean_chars": round(mean, 2),
                  "sd_chars": round(sd, 2)}
        shares[h] = n * sd
        tot_ns += n * sd
    for h in out:
        sh = shares[h] / tot_ns if tot_ns > 0 else None
        out[h]["neyman_share"] = round(sh, 4) if sh is not None else None
        out[h]["neyman_alloc"] = int(math.floor(
            _STRATA_BUDGET * (sh or 0.0)))
    return out


def test_strata_match_python_and_fund_variance(spark, tmp_path):
    # bimodal: tight mode at ~100, wide mode at 1000-9000
    vals = [100 + (i % 5) for i in range(60)]
    vals += [1000 + 97 * (i % 80) for i in range(60)]
    _write_docs_nchars(spark, tmp_path, vals)
    want = _strata_py(vals)
    got = {r["stratum"]: r
           for r in q_cum_sqrt_f_strata(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for h, w in want.items():
        for k, v in w.items():
            assert got[h][k] == v, (h, k, got[h][k], v)
    # strata partition the corpus and respect value order
    assert sum(r["n_docs"] for r in got.values()) == len(vals)
    bounds = [got[h]["chars_hi"] for h in sorted(got)]
    assert bounds == sorted(bounds)
    # the wide mode (later strata) draws more audit budget per doc
    lo_h, hi_h = min(got), max(got)
    per_doc_lo = got[lo_h]["neyman_alloc"] / got[lo_h]["n_docs"]
    per_doc_hi = got[hi_h]["neyman_alloc"] / got[hi_h]["n_docs"]
    assert per_doc_hi > per_doc_lo


# ------------------------------------------------------ binned_mi_length_quality


def _mi_py(texts):
    recs = []
    for i, t in enumerate(texts, 1):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000 for w in toks)
        prob = round(
            1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(toks), 1)))), 4)
        recs.append((len(t), i, min(int(prob * 10), 9)))
    recs.sort()
    n = len(recs)
    cells: Counter = Counter()
    for rk, (_, _, yb) in enumerate(recs):
        xb = min(9, (10 * rk) // n)
        cells[(xb, yb)] += 1

    def fold(counter):
        return sum(c * math.log(c) for c in counter.values())

    xs: Counter = Counter()
    ys: Counter = Counter()
    for (xb, yb), c in cells.items():
        xs[xb] += c
        ys[yb] += c
    mi = (fold(cells) - fold(xs) - fold(ys) + n * math.log(n)) / n
    hx = math.log(n) - fold(xs) / n
    hy = math.log(n) - fold(ys) / n
    kxy, kx, ky = len(cells), len(xs), len(ys)
    mm = mi - (kxy - kx - ky + 1) / (2.0 * n)
    nmi = mi / min(hx, hy) if min(hx, hy) > 0 else None
    return {
        "n_docs": n, "n_cells": kxy,
        "mi_bits": round(mi / math.log(2), 4),
        "mi_mm_bits": round(mm / math.log(2), 4),
        "nmi": round(nmi, 4) if nmi is not None else None,
    }


def test_mi_matches_python(spark, tmp_path):
    texts = []
    for i in range(50):
        words = [f"tok{i}x{j}" for j in range(4 + i % 8)]
        body = " ".join(words)
        texts.append((body + ". ") * (2 + i % 9))
    _write_docs(spark, tmp_path, texts)
    want = _mi_py(texts)
    r = q_binned_mi_length_quality(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert r["mi_mm_bits"] <= r["mi_bits"]  # correction only subtracts


def test_mi_zero_when_quality_is_constant(spark, tmp_path):
    # one repeated word -> identical prob for every doc -> single y bin
    texts = [("word " * (5 + i)) for i in range(30)]
    _write_docs(spark, tmp_path, texts)
    r = q_binned_mi_length_quality(spark, str(tmp_path)).collect()[0]
    assert r["mi_bits"] == 0.0
    assert r["nmi"] is None            # min marginal entropy is 0


# --------------------------------------------------------------- km_greenwood_ci


def _greenwood_py(user_weeks):
    w_end = max(max(ws) for ws in user_weeks.values())
    ages: Counter = Counter()
    deaths: Counter = Counter()
    for ws in user_weeks.values():
        t = max(ws) - min(ws)
        ages[t] += 1
        if max(ws) != w_end:
            deaths[t] += 1
    out = {}
    s = 1.0
    gw = 0.0
    for a in sorted(ages):
        r = sum(c for t, c in ages.items() if t >= a)
        d = deaths.get(a, 0)
        s *= max(1 - d / r, 1e-15)
        if r > d:
            gw += d / (r * (r - d))
        se = s * math.sqrt(gw)
        out[a] = {
            "n_at_risk": r, "n_churned": d,
            "km_survival": round(s, 4),
            "greenwood_se": round(se, 4),
            "ci_lo": round(max(0.0, s - 1.96 * se), 4),
            "ci_hi": round(min(1.0, s + 1.96 * se), 4),
        }
    return out


def test_greenwood_matches_python(spark, tmp_path):
    user_weeks = {}
    uid = 0
    for age, cnt in [(1, 8), (2, 5), (3, 4), (5, 2)]:
        for _ in range(cnt):
            uid += 1
            user_weeks[uid] = [0, age]
    for _ in range(4):                    # censored long-lived users
        uid += 1
        user_weeks[uid] = [0, 9]
    _write_user_weeks(spark, tmp_path, user_weeks)
    want = _greenwood_py(user_weeks)
    got = {r["age_weeks"]: r
           for r in q_km_greenwood_ci(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for a, w in want.items():
        for k, v in w.items():
            assert got[a][k] == v, (a, k, got[a][k], v)
    # bands are honest: lo <= point <= hi everywhere
    for r in got.values():
        assert r["ci_lo"] <= r["km_survival"] <= r["ci_hi"]


def test_greenwood_no_churn_zero_band(spark, tmp_path):
    user_weeks = {u: [0, 6] for u in range(1, 8)}   # all censored
    _write_user_weeks(spark, tmp_path, user_weeks)
    rows = q_km_greenwood_ci(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["km_survival"] == 1.0
    assert r["greenwood_se"] == 0.0
    assert r["ci_lo"] == 1.0 and r["ci_hi"] == 1.0
