"""Round-5 batch-75 operators on crafted inputs, verified against
independent Python computations: tau_ap_sources (symmetrized
top-weighted AP rank correlation), page_trend_dayparts (Page's L for
monotone ordered alternatives across dayparts blocked by event type),
id_space_estimate (German-tank serial estimator with realized-error
accounting).  Plan pins at the bottom."""

from __future__ import annotations

import datetime
import hashlib
import math
from collections import defaultdict

from pdf_extractor_spark.queries import (
    q_id_space_estimate,
    q_page_trend_dayparts,
    q_tau_ap_sources,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ----------------------------------------------------------------- tau_AP


def _write_docs_layout(spark, path, layout):
    """layout: (source, n_docs, n_unique)"""
    rows, did = [], 0
    for s, n, u in layout:
        for i in range(n):
            did += 1
            rows.append((did, f"doc {s} {i % u}", "en", s, 10))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _tau_ap_ref(layout):
    srcs = [s for s, _, _ in layout]
    vols = {s: n for s, n, _ in layout}
    uniq = {s: u for s, _, u in layout}
    ra = {s: r + 1 for r, s in
          enumerate(sorted(srcs, key=lambda s: (-vols[s], s)))}
    rb = {s: r + 1 for r, s in
          enumerate(sorted(srcs, key=lambda s: (-uniq[s], s)))}
    n = len(srcs)

    def one(r_est, r_truth):
        t = 0.0
        for s in srcs:
            i = r_est[s]
            if i == 1:
                continue
            c = sum(1 for s2 in srcs
                    if r_est[s2] < i and r_truth[s2] < r_truth[s])
            t += c / (i - 1)
        return 2 * t / (n - 1) - 1

    ta, tb = one(ra, rb), one(rb, ra)
    sym = (ta + tb) / 2
    verdict = ("rankings_agree" if sym >= 0.8
               else "rankings_drift" if sym >= 0.0
               else "rankings_inverted")
    return (n, _r(ta), _r(tb), _r(sym), verdict)


def test_tau_ap_disagreement(spark, tmp_path):
    layout = [("a", 30, 5), ("b", 25, 25), ("c", 20, 18), ("d", 15, 2),
              ("e", 10, 10), ("f", 5, 5)]
    _write_docs_layout(spark, tmp_path, layout)
    got = q_tau_ap_sources(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _tau_ap_ref(layout)
    assert got[0]["verdict"] == "rankings_drift"


def test_tau_ap_identical_rankings(spark, tmp_path):
    layout = [("a", 40, 35), ("b", 30, 25), ("c", 20, 15), ("d", 10, 5)]
    _write_docs_layout(spark, tmp_path, layout)
    r = q_tau_ap_sources(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tau_ap_ref(layout)
    assert r["tau_ap_sym"] == 1.0 and r["verdict"] == "rankings_agree"


def test_tau_ap_inverted(spark, tmp_path):
    # most-voluminous source has the FEWEST uniques, strictly inverted
    layout = [("a", 40, 2), ("b", 30, 4), ("c", 20, 8), ("d", 10, 9)]
    _write_docs_layout(spark, tmp_path, layout)
    r = q_tau_ap_sources(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tau_ap_ref(layout)
    assert r["tau_ap_sym"] == -1.0 and r["verdict"] == "rankings_inverted"


# -------------------------------------------------------------- Page test


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _page_ref(ev):
    cells = defaultdict(float)
    types = set()
    for (_eid, _u, et, ts, _v) in ev:
        cells[(et, ts.hour // 4)] += 1
        types.add(et)
    rj = defaultdict(float)
    for et in types:
        vals = [cells.get((et, b), 0.0) for b in range(6)]
        for b in range(6):
            lo = sum(1 for x in vals if x < vals[b])
            eq = sum(1 for x in vals if x == vals[b])
            rj[b] += lo + (eq + 1) / 2.0
    bn, k = len(types), 6
    lstat = sum((b + 1) * rj[b] for b in range(6))
    mu = bn * k * (k + 1) ** 2 / 4
    sd = math.sqrt(bn * k * k * (k + 1) ** 2 * (k * k - 1)
                   / (144 * (k - 1)))
    z = (lstat - mu) / sd
    verdict = ("monotone_increase" if z > 1.6449
               else "monotone_decrease" if z < -1.6449
               else "no_ordered_trend")
    return (bn, k, _r(lstat, 1), _r(mu, 1), _r(z), verdict)


def _mk_events(counts_fn, types=("click", "view", "purchase")):
    """counts_fn(type_index, hour) -> events in that hour."""
    ev, eid = [], 0
    for ti, et in enumerate(types):
        for day in range(2):
            for h in range(24):
                for _ in range(counts_fn(ti, h)):
                    eid += 1
                    ev.append((eid, eid % 40, et,
                               datetime.datetime(2024, 3, 10 + day, h, 15),
                               1.0))
    return ev


def test_page_ramp_detected(spark, tmp_path):
    ev = _mk_events(lambda ti, h: 1 + h // 4 + (ti + h) % 2)
    _write_events(spark, tmp_path, ev)
    got = q_page_trend_dayparts(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _page_ref(ev)
    assert got[0]["verdict"] == "monotone_increase"


def test_page_flat_no_trend(spark, tmp_path):
    # volumes vary by type but NOT monotonically in daypart
    ev = _mk_events(lambda ti, h: 2 + (ti * 3 + h * 5) % 4)
    _write_events(spark, tmp_path, ev)
    r = q_page_trend_dayparts(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _page_ref(ev)
    assert r["verdict"] == "no_ordered_trend"


def test_page_decreasing(spark, tmp_path):
    ev = _mk_events(lambda ti, h: 1 + (23 - h) // 4)
    _write_events(spark, tmp_path, ev)
    r = q_page_trend_dayparts(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _page_ref(ev)
    assert r["verdict"] == "monotone_decrease"
    # empty-bin path: block with zero events in some daypart
    ev2 = [e for e in ev if not (e[2] == "view" and e[3].hour < 8)]
    _write_events(spark, tmp_path, ev2)
    r2 = q_page_trend_dayparts(spark, str(tmp_path)).collect()[0]
    assert tuple(r2) == _page_ref(ev2)


# ---------------------------------------------------------- german tank


def _write_docs_ids(spark, path, ids):
    spark.createDataFrame(
        [(i, "x", "en", "s", 5) for i in ids],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _gt_ref(ids):
    serials = [i + 1 for i in ids]
    samp = [s for s in serials if _md5u(str(s - 1)) % 10 == 0]
    k, m, tn = len(samp), max(samp), max(serials)
    mv = m + m / k - 1
    ci = m / 0.05 ** (1 / k)
    return (len(ids), tn, k, m, _r(mv, 2), _r(ci, 2),
            _r((mv - tn) / tn), 1 if tn <= ci else 0)


def test_gt_matches_reference(spark, tmp_path):
    ids = list(range(240))
    _write_docs_ids(spark, tmp_path, ids)
    got = q_id_space_estimate(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _gt_ref(ids)
    # sanity: ~10% sampling and an estimate in the right ballpark
    assert 10 <= got[0]["n_sampled"] <= 40
    assert abs(got[0]["rel_error"]) < 0.25


def test_gt_sparse_ids(spark, tmp_path):
    # id space with gaps (deleted docs): estimator targets the SERIAL
    # max, undershooting when the max id itself is unsampled
    ids = [i * 7 for i in range(60)]
    _write_docs_ids(spark, tmp_path, ids)
    r = q_id_space_estimate(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _gt_ref(ids)
    assert r["max_sampled_serial"] <= r["true_id_space"]


# ------------------------------------------------------------ plan shapes


def test_plans_bounded_no_cartesian(spark, tmp_path):
    _write_docs_layout(spark, tmp_path,
                       [("a", 8, 4), ("b", 6, 6), ("c", 4, 2)])
    plan = q_tau_ap_sources(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    # joins run over the |sources|-row ranked table only
    assert plan.count("Scan parquet") <= 3
    assert "CartesianProduct" not in plan

    _write_docs_ids(spark, tmp_path, list(range(30)))
    plan = q_id_space_estimate(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan

    ev = _mk_events(lambda ti, h: 1)
    _write_events(spark, tmp_path, ev)
    plan = q_page_trend_dayparts(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan
