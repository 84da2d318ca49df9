"""Round-5 batch-70 operators on crafted inputs, verified against
independent Python computations: lm_interpolation_sweep
(Jelinek-Mercer bigram/unigram held-out curve), sq8_clip_scaling_gain
(max-abs vs p95-clip int8 reconstruction error), extremal_index_runs
(Ferro-Segers runs declustering of daily-load extremes).  Plan pins
at the bottom."""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _EXTREMAL_GAP,
    _LM_LAMBDAS,
    q_extremal_index_runs,
    q_lm_interpolation_sweep,
    q_sq8_clip_scaling_gain,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_emb(spark, path, vecs):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_events_daily(spark, path, counts):
    out, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            out.append((eid, _EPOCH + dt.timedelta(days=d, seconds=eid),
                        1, "e", 1.0, "{}"))
    spark.createDataFrame(
        out,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------------ LM JM


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _lm_ref(texts):
    n = len(texts)
    train, test = [], []
    for i, t in enumerate(texts, 1):
        (train if i * 5 <= n * 4 else test).append(_toks(t))
    uni, bi = Counter(), Counter()
    for ws in train:
        for a, b in zip(ws, ws[1:]):
            uni[b] += 1
            bi[(a, b)] += 1
    pv = Counter()
    for (a, _), c in bi.items():
        pv[a] += c
    tt = float(sum(uni.values()))
    vv = float(len(uni))
    tb = Counter()
    for ws in test:
        for a, b in zip(ws, ws[1:]):
            tb[(a, b)] += 1
    out = []
    for lam in _LM_LAMBDAS:
        nll = 0.0
        ntest = 0.0
        for (a, b), tc in tb.items():
            p_uni = (uni.get(b, 0) + 1.0) / (tt + vv + 1.0)
            p_bi = bi.get((a, b), 0) / pv[a] if a in pv else 0.0
            nll += tc * -math.log(lam * p_bi + (1 - lam) * p_uni)
            ntest += tc
        out.append((round(lam, 2), int(ntest), _r(nll / ntest, 4),
                    _r(math.exp(nll / ntest), 2)))
    return out


def test_lm_matches_reference(spark, tmp_path):
    texts = (["the quick fox jumps the lazy dog"] * 6
             + ["the quick dog naps near the lazy fox"] * 6
             + ["a slow cat walks the long road"] * 4
             + ["the quick fox naps the slow cat walks"] * 4)
    _write_docs(spark, tmp_path, texts)
    got = [tuple(r) for r in
           q_lm_interpolation_sweep(spark, str(tmp_path)).collect()]
    assert got == _lm_ref(texts)


def test_lm_templated_corpus_prefers_bigram(spark, tmp_path):
    # identical train/test template: bigrams near-deterministic ->
    # cross-entropy strictly improves as lambda grows
    texts = ["alpha beta gamma delta alpha beta gamma"] * 20
    _write_docs(spark, tmp_path, texts)
    got = [tuple(r) for r in
           q_lm_interpolation_sweep(spark, str(tmp_path)).collect()]
    assert got == _lm_ref(texts)
    xs = [g[2] for g in got]
    assert all(a >= b for a, b in zip(xs, xs[1:]))


# ------------------------------------------------------------- SQ8 clip


def _f32(v):
    import numpy as np

    return [float(np.float32(x)) for x in v]


def _sq8clip_ref(vecs):
    n = len(vecs)
    m_max = m_clip = bm_max = bm_clip = csh = rg = 0.0
    for v in vecs:
        v = _f32(v)
        d = len(v)
        sa = sorted(abs(x) for x in v)
        s_max = 127.0 / max(sa[-1], 1e-30)
        s_clip = 127.0 / max(sa[math.ceil(d * 0.95) - 1], 1e-30)
        qm = [int(math.floor(x * s_max + 0.5)) for x in v]
        qc = [max(-127, min(127, int(math.floor(x * s_clip + 0.5))))
              for x in v]
        e_max = sum((x - q / s_max) ** 2 for x, q in zip(v, qm)) / d
        e_clip = sum((x - q / s_clip) ** 2 for x, q in zip(v, qc)) / d
        bulk = [i for i in range(d) if abs(v[i]) * s_clip <= 127.0]
        bn = float(len(bulk))
        b_max = sum((v[i] - qm[i] / s_max) ** 2 for i in bulk) / bn
        b_clip = sum((v[i] - qc[i] / s_clip) ** 2 for i in bulk) / bn
        m_max += e_max
        m_clip += e_clip
        bm_max += b_max
        bm_clip += b_clip
        csh += 1.0 - bn / d
        rg += s_clip / s_max
    return (n, _r(m_max / n, 8), _r(m_clip / n, 8),
            _r(bm_max / n, 8), _r(bm_clip / n, 8),
            _r((bm_max / n) / (bm_clip / n), 4),
            _r(csh / n, 4), _r(rg / n, 4))


def test_sq8clip_matches_reference(spark, tmp_path):
    # heavy-outlier vectors: one coordinate 10x the rest
    vecs = []
    for i in range(20):
        v = [0.1 * ((i * j) % 7 - 3) for j in range(64)]
        v[i % 64] = 10.0 + i          # the outlier
        vecs.append(v)
    _write_emb(spark, tmp_path, vecs)
    got = q_sq8_clip_scaling_gain(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _sq8clip_ref(vecs)
    # outliers waste the max-abs range: the BULK fidelity must win
    # big under clipping, while total MSE pays the saturation cost
    assert got[0]["bulk_improvement_x"] > 4.0
    assert got[0]["mse_clip_scale"] > got[0]["mse_max_scale"]
    assert got[0]["clipped_coord_share"] > 0


def test_sq8clip_no_outliers_parity(spark, tmp_path):
    # smooth vectors: clipping ~ max scaling, improvement ~ 1
    vecs = [[math.sin(0.1 * i + 0.2 * j) for j in range(64)]
            for i in range(15)]
    _write_emb(spark, tmp_path, vecs)
    r = q_sq8_clip_scaling_gain(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _sq8clip_ref(vecs)
    assert 0.5 < r["bulk_improvement_x"] < 3.0
    assert r["avg_scale_gain_x"] < 1.5


# --------------------------------------------------------- extremal index


def _ext_ref(counts):
    n = len(counts)
    vals = sorted(float(c) for c in counts)
    h = (n - 1) * 0.95
    lo = int(math.floor(h))
    hi = min(lo + 1, n - 1)
    thr = vals[lo] + (h - lo) * (vals[hi] - vals[lo])
    ex = [d for d, c in enumerate(counts) if c > thr]
    ncl = 0
    prev = None
    for d in ex:
        if prev is None or d - prev > _EXTREMAL_GAP:
            ncl += 1
        prev = d
    ne = len(ex)
    theta = ncl / ne if ne else None
    reading = ("no_exceedances" if ne == 0
               else "independent_extremes" if theta > 0.8
               else "weakly_clustered" if theta > 0.5
               else "strongly_clustered")
    return (n, _r(thr, 2), ne, ncl,
            _r(theta, 4) if theta else None,
            _r(ne / ncl, 2) if ncl else None, reading)


def test_extremal_matches_reference_storms(spark, tmp_path):
    # extremes arrive in 3-day storms -> theta well below 1
    counts = [20] * 40
    for s in (5, 6, 7, 20, 21, 22, 33, 34):
        counts[s] = 100 + s
    _write_events_daily(spark, tmp_path, counts)
    got = q_extremal_index_runs(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _ext_ref(counts)
    assert got[0]["reading"] == "strongly_clustered"


def test_extremal_isolated_spikes(spark, tmp_path):
    # 3 spikes in 60 days keeps p95 BETWEEN baseline and spike level
    counts = [20] * 60
    for s in (9, 27, 45):                  # all > gap apart
        counts[s] = 150
    _write_events_daily(spark, tmp_path, counts)
    r = q_extremal_index_runs(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _ext_ref(counts)
    assert r["extremal_index"] == 1.0
    assert r["reading"] == "independent_extremes"


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_docs(spark, tmp_path,
                ["the quick fox the lazy dog"] * 8 + ["a b c d"] * 2)
    _write_emb(spark, tmp_path,
               [[0.1 * ((i + j) % 5) for j in range(64)]
                for i in range(6)])
    _write_events_daily(spark, tmp_path,
                        [10 + (i % 4) * 3 for i in range(20)])
    for fn, mx in ((q_lm_interpolation_sweep, 2),
                   (q_sq8_clip_scaling_gain, 1),
                   (q_extremal_index_runs, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
