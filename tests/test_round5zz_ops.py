"""Round-5 batch-54 operators on crafted inputs, verified against
independent Python computations: clustering_external_agreement (ARI,
Fowlkes-Mallows, homogeneity/completeness/V, sqrt-NMI between the
label column and the first-3-dim sign octants), p_chart_monitor
(Shewhart p-chart with Nelson rule 2), lead_lag_ccf (daily
cross-correlation sweep between the two busiest event types)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from pdf_extractor_spark.queries import (
    q_clustering_external_agreement,
    q_lead_lag_ccf,
    q_p_chart_monitor,
)

_EPOCH = dt.datetime(2024, 3, 4)


def _write_emb(spark, path, rows):
    """rows: (vec_id, [floats], label)"""
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _write_events(spark, path, rows):
    """rows: (day, event_type, n_copies)"""
    out, eid = [], 0
    for day, et, n in rows:
        for _ in range(n):
            eid += 1
            out.append(
                (eid, _EPOCH + dt.timedelta(days=day, seconds=eid), eid,
                 et, 1.0, "{}"))
    spark.createDataFrame(
        out,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ----------------------------------------------- clustering_external_agreement


def _octant(v):
    return (4 if v[0] > 0 else 0) + (2 if v[1] > 0 else 0) \
        + (1 if v[2] > 0 else 0)


def _agreement_ref(pairs):
    """pairs: [(label, bucket)] -> dict of indices."""
    n = len(pairs)
    ct = Counter(pairs)
    ai = Counter(l for l, _ in pairs)
    bj = Counter(b for _, b in pairs)
    c2 = lambda x: x * (x - 1) / 2.0  # noqa: E731
    sp = sum(c2(v) for v in ct.values())
    pa = sum(c2(v) for v in ai.values())
    pb = sum(c2(v) for v in bj.values())
    tp = c2(n)
    ari = (sp - pa * pb / tp) / ((pa + pb) / 2.0 - pa * pb / tp)
    fm = sp / math.sqrt(pa * pb)
    hc = -sum(v / n * math.log(v / n) for v in ai.values())
    hk = -sum(v / n * math.log(v / n) for v in bj.values())
    hc_k = -sum(v / n * math.log(v / bj[b]) for (_, b), v in ct.items())
    hk_c = -sum(v / n * math.log(v / ai[l]) for (l, _), v in ct.items())
    h = 1.0 - hc_k / hc if hc > 0 else 1.0
    c = 1.0 - hk_c / hk if hk > 0 else 1.0
    return {
        "ari": ari, "fm": fm, "h": h, "c": c,
        "v": 2 * h * c / (h + c) if h + c > 0 else 0.0,
        "nmi": (hc - hc_k) / math.sqrt(hc * hk),
        "kc": len(ai), "kk": len(bj),
    }


def test_agreement_exact_formula_mixed(spark, tmp_path):
    # labels partially aligned with octants: label 0 mostly (+,+,+)=7,
    # label 1 mostly (-,-,-)=0, with deliberate crossovers
    rows = []
    vecs = ([( [1, 1, 1, 9], 0)] * 5 + [([-1, -1, -1, 9], 1)] * 4
            + [([1, -1, 1, 9], 0)] * 2 + [([1, 1, 1, 9], 1)] * 1
            + [([-1, 1, -1, 9], 1)] * 2)
    for i, (v, l) in enumerate(vecs):
        rows.append((i + 1, v, l))
    _write_emb(spark, tmp_path, rows)
    ref = _agreement_ref([(l, _octant(v)) for v, l in vecs])
    r = q_clustering_external_agreement(spark, str(tmp_path)).collect()[0]
    assert r["n_vecs"] == len(vecs)
    assert r["k_labels"] == ref["kc"] and r["k_buckets"] == ref["kk"]
    assert r["ari"] == round(ref["ari"], 4)
    assert r["fowlkes_mallows"] == round(ref["fm"], 4)
    assert r["homogeneity"] == round(ref["h"], 4)
    assert r["completeness"] == round(ref["c"], 4)
    assert r["v_measure"] == round(ref["v"], 4)
    assert r["nmi_sqrt"] == round(ref["nmi"], 4)


def test_agreement_perfect_match_is_one(spark, tmp_path):
    # each label maps 1:1 onto one octant -> every index = 1
    rows = ([(i + 1, [1, 1, 1, 0], 0) for i in range(4)]
            + [(i + 5, [-1, -1, -1, 0], 1) for i in range(4)]
            + [(i + 9, [1, -1, -1, 0], 2) for i in range(3)])
    _write_emb(spark, tmp_path, rows)
    r = q_clustering_external_agreement(spark, str(tmp_path)).collect()[0]
    for col in ("ari", "fowlkes_mallows", "homogeneity", "completeness",
                "v_measure", "nmi_sqrt"):
        assert r[col] == 1.0, col


# --------------------------------------------------------------- p_chart


def _pchart_ref(day_counts):
    """day_counts: [(n, errs)] by day order."""
    tot_n = sum(n for n, _ in day_counts)
    tot_e = sum(e for _, e in day_counts)
    pbar = tot_e / tot_n
    ooc_h = ooc_l = 0
    max_sig = -math.inf
    sides = []
    for n, e in day_counts:
        p = e / n
        hw = 3.0 * math.sqrt(pbar * (1 - pbar) / n)
        max_sig = max(max_sig, (p - pbar) / hw)
        if p > pbar + hw:
            ooc_h += 1
        if p < pbar - hw:
            ooc_l += 1
        sides.append(1 if p > pbar else (-1 if p < pbar else 0))
    runs, i = [], 0
    while i < len(sides):
        j = i
        while j < len(sides) and sides[j] == sides[i]:
            j += 1
        runs.append((sides[i], j - i))
        i = j
    rule2 = sum(1 for s, ln in runs if s != 0 and ln >= 9)
    max_run = max((ln for s, ln in runs if s != 0), default=0)
    return pbar, max_sig, ooc_h, ooc_l, rule2, max_run


def test_p_chart_exact_formula(spark, tmp_path):
    # 12 days: day 5 spikes errors (rule 1 high); days 6-11 low-ish
    spec = [(40, 4), (40, 5), (40, 4), (40, 5), (40, 4), (40, 30),
            (40, 2), (40, 2), (40, 2), (40, 2), (40, 2), (40, 2)]
    rows = []
    for d, (n, e) in enumerate(spec):
        rows.append((d, "error", e))
        rows.append((d, "view", n - e))
    _write_events(spark, tmp_path, rows)
    pbar, max_sig, ooc_h, ooc_l, rule2, max_run = _pchart_ref(spec)
    r = q_p_chart_monitor(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 12
    assert r["pbar"] == round(pbar, 4)
    assert r["max_sigma_units"] == round(max_sig, 4)
    assert (r["n_ooc_high"], r["n_ooc_low"]) == (ooc_h, ooc_l)
    assert r["n_ooc_high"] >= 1  # the spike day must breach
    assert r["n_rule2_runs"] == rule2
    assert r["max_run_len"] == max_run


def test_p_chart_rule2_long_drift(spark, tmp_path):
    # first 9 days slightly high, next 9 slightly low -> two rule-2 runs,
    # no rule-1 breach (deviations are small at n=200)
    spec = [(200, 22)] * 9 + [(200, 18)] * 9
    rows = []
    for d, (n, e) in enumerate(spec):
        rows.append((d, "error", e))
        rows.append((d, "click", n - e))
    _write_events(spark, tmp_path, rows)
    r = q_p_chart_monitor(spark, str(tmp_path)).collect()[0]
    assert (r["n_ooc_high"], r["n_ooc_low"]) == (0, 0)
    assert r["n_rule2_runs"] == 2
    assert r["max_run_len"] == 9


# --------------------------------------------------------------- lead_lag_ccf


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    return cov / math.sqrt(vx * vy)


def test_lead_lag_ccf_detects_shift(spark, tmp_path):
    # 'click' (busiest) leads 'view' by exactly 2 days: view[d] = click[d-2]
    click = [10, 3, 14, 5, 18, 7, 11, 4, 16, 9, 13, 6, 15, 8]
    view = [2, 2] + click[:-2]
    rows = []
    for d, c in enumerate(click):
        rows.append((d, "click", c))
    for d, v in enumerate(view):
        rows.append((d, "view", v))
    _write_events(spark, tmp_path, rows)
    out = {r["lag_days"]: r
           for r in q_lead_lag_ccf(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(-3, 4))
    r0 = out[0]
    assert (r0["type_a"], r0["type_b"]) == ("click", "view")
    # reference r at each lag over the overlapping day window
    days = range(len(click))
    per = defaultdict(dict)
    for d in days:
        per[d]["a"] = click[d]
        per[d]["b"] = view[d]
    for lag in range(-3, 4):
        xs = [click[d] for d in days if 0 <= d + lag < len(view)]
        ys = [view[d + lag] for d in days if 0 <= d + lag < len(view)]
        ref = _pearson(xs, ys)
        assert out[lag]["ccf_r"] == round(ref, 4), lag
        assert out[lag]["n_days"] == len(xs)
    # the +2 lag is the (unique) peak and is near-perfect correlation
    assert out[2]["is_peak"] and out[2]["ccf_r"] > 0.99
    assert sum(1 for r in out.values() if r["is_peak"]) == 1
