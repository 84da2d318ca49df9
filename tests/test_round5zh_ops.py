"""Round-5 batch-36 operators on crafted inputs, verified against
independent Python computations: ngram_entropy_rate (closed-form
alternating corpus + general Counter-based reference),
ht_total_estimate (Horvitz-Thompson per-source totals),
sn_robust_scale (Rousseeuw-Croux Sn with textbook rank conventions)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _HT_SAMPLE_MOD,
    _SN_C,
    q_ht_total_estimate,
    q_ngram_entropy_rate,
    q_sn_robust_scale,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_docs(spark, path, rows):
    """rows: (doc_id, source, text)."""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in rows],
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


# ---------------------------------------------------------- ngram_entropy_rate


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _entropy_py(texts):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        ws = _toks(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    nb = sum(bi.values())

    def h(counter, total):
        return (math.log(total)
                - sum(c * math.log(c) for c in counter.values()) / total
                ) / math.log(2)

    h1 = h(uni, n)
    hb = h(bi, nb)
    first: Counter = Counter()
    for (w1, _), c in bi.items():
        first[w1] += c
    hf = h(first, nb)
    return {
        "n_tokens": n, "vocab": len(uni), "n_bigrams": nb,
        "h_unigram_bits": round(h1, 4),
        "h_bigram_joint_bits": round(hb, 4),
        "h_conditional_bits": round(hb - hf, 4),
        "redundancy": round(1 - (hb - hf) / h1, 4),
    }


def test_entropy_alternating_corpus_fully_redundant(spark, tmp_path):
    texts = ["alpha beta " * 20, "alpha beta " * 10 + "alpha"]
    _write_docs(spark, tmp_path,
                [(i, "s", t) for i, t in enumerate(texts, 1)])
    r = q_ngram_entropy_rate(spark, str(tmp_path)).collect()[0]
    # next word is DETERMINED by the previous one
    assert r["h_conditional_bits"] == 0.0
    assert r["redundancy"] == 1.0
    assert r["h_unigram_bits"] == round(_entropy_py(texts)
                                        ["h_unigram_bits"], 4)


def test_entropy_matches_counter_reference(spark, tmp_path):
    texts = []
    for i in range(12):
        ws = [f"w{(i * j * 7 + j * j) % 23}" for j in range(30)]
        texts.append(" ".join(ws))
    _write_docs(spark, tmp_path,
                [(i, "s", t) for i, t in enumerate(texts, 1)])
    want = _entropy_py(texts)
    r = q_ngram_entropy_rate(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert 0.0 <= r["redundancy"] <= 1.0
    assert r["h_conditional_bits"] <= r["h_unigram_bits"]


# ----------------------------------------------------------- ht_total_estimate


def test_ht_totals_match_python(spark, tmp_path):
    rows = []
    for i in range(1, 161):
        src = "a" if i % 2 else "b"
        rows.append((i, src, "x" * (40 + 13 * (i % 7))))
    _write_docs(spark, tmp_path, rows)
    per_src: dict[str, dict] = {}
    for i, s, t in rows:
        st = per_src.setdefault(s, {"n": 0, "tot": 0, "ns": 0, "st": 0})
        st["n"] += 1
        st["tot"] += len(t)
        if _md5int(str(i)) % _HT_SAMPLE_MOD == 0:
            st["ns"] += 1
            st["st"] += len(t)
    assert all(v["ns"] > 0 for v in per_src.values())
    got = {r["source"]: r
           for r in q_ht_total_estimate(spark, str(tmp_path)).collect()}
    for s, w in per_src.items():
        r = got[s]
        assert r["n_docs"] == w["n"]
        assert r["n_sampled"] == w["ns"]
        assert r["exact_total_chars"] == w["tot"]
        assert r["ht_estimate_chars"] == _HT_SAMPLE_MOD * w["st"]
        assert r["rel_err"] == round(
            abs(_HT_SAMPLE_MOD * w["st"] - w["tot"]) / w["tot"], 4)
        assert r["realized_rate"] == round(w["ns"] / w["n"], 4)


# ------------------------------------------------------------- sn_robust_scale


def _low_med(vals):
    vs = sorted(vals)
    return vs[(len(vs) - 1) // 2]


def _high_med(vals):
    vs = sorted(vals)
    return vs[len(vs) // 2]


def _sn_py(counts):
    y = list(counts)
    n = len(y)
    inner = [
        _high_med([abs(y[i] - y[j]) for j in range(n) if j != i])
        for i in range(n)
    ]
    sn_core = _low_med(inner)
    med = _low_med(y)
    mad = _low_med([abs(v - med) for v in y])
    my = sum(y) / n
    sd = math.sqrt(sum((v - my) ** 2 for v in y) / (n - 1))
    return {
        "n_days": n,
        "sn_core": sn_core,
        "sn_scale": round(_SN_C * sn_core, 4),
        "mad_scale": round(1.4826 * mad, 4),
        "sample_sd": round(sd, 4),
    }


def test_sn_matches_textbook_reference(spark, tmp_path):
    counts = [7, 9, 8, 30, 10, 6, 9, 11, 8, 7, 45, 9]
    _write_daily_counts(spark, tmp_path, counts)
    want = _sn_py(counts)
    r = q_sn_robust_scale(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    # the two spike days inflate the SD but not the robust scales
    assert r["sample_sd"] > 3 * r["sn_scale"]


def test_sn_constant_series_zero_scale(spark, tmp_path):
    _write_daily_counts(spark, tmp_path, [5] * 9)
    r = q_sn_robust_scale(spark, str(tmp_path)).collect()[0]
    assert r["sn_scale"] == 0.0
    assert r["mad_scale"] == 0.0
    assert r["sample_sd"] == 0.0
