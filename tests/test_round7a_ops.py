"""Round-5 batch-80 operators on crafted inputs, verified against
independent Python computations: ivf_sq8_recall (composed IVF+int8
recall with per-query loss attribution), fold_stability_audit (chi2
homogeneity of the gate across md5 CV folds),
quasi_identifier_risk_curve (GROUPING SETS re-identification curve).
Plan pins at the bottom."""

from __future__ import annotations

import datetime
import hashlib
import math
import re
import struct
from collections import defaultdict

from pdf_extractor_spark.queries import (
    _IVFSQ8_K,
    _IVFSQ8_NQ,
    q_fold_stability_audit,
    q_ivf_sq8_recall,
    q_quasi_identifier_risk_curve,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


# ---------------------------------------------------------- ivf_sq8_recall


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(vid, [float(x) for x in v], lab) for vid, v, lab in vecs],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _ivfsq8_ref(vecs):
    emap = {vid: [_f32(x) for x in v] for vid, v, _ in vecs}
    lmap = {vid: lab for vid, _, lab in vecs}

    def scale_of(v):
        return 127.0 / max(max(abs(x) for x in v), 1e-30)

    def codes_of(v):
        s = scale_of(v)
        return [math.floor(x * s + 0.5) for x in v]

    k = _IVFSQ8_K
    qids = sorted(sorted(emap, key=lambda vid: (_md5u(str(vid)), vid))
                  [:_IVFSQ8_NQ])
    out = []
    for qid in qids:
        fd = sorted(((round(sum(a * b for a, b in
                                zip(emap[i], emap[qid])), 4), i)
                     for i in emap if i != qid),
                    key=lambda t: (-t[0], t[1]))
        topk = [(i, lmap[i]) for _, i in fd[:k]]
        ql = lmap[qid]
        qc, qs = codes_of(emap[qid]), scale_of(emap[qid])
        cand = []
        for i in emap:
            if i == qid or lmap[i] != ql:
                continue
            ic, isc = codes_of(emap[i]), scale_of(emap[i])
            qd = round(sum(a * b for a, b in zip(ic, qc)) / (isc * qs), 4)
            cand.append((qd, i))
        candk = {i for _, i in
                 sorted(cand, key=lambda t: (-t[0], t[1]))[:k]}
        ceil = sum(1 for _i, lab in topk if lab == ql)
        ov = sum(1 for i, _lab in topk if i in candk)
        out.append((qid, ceil, ov, _r(ov / k), _r((k - ceil) / k),
                    _r((ceil - ov) / k)))
    return out


def _mk_vecs(n=60, dim=12, cells=3):
    return [(vid,
             [math.sin(vid * 0.37 + j * 0.91)
              * (1 + 0.15 * ((vid + j) % 4)) for j in range(dim)],
             vid % cells) for vid in range(n)]


def test_ivfsq8_matches_reference(spark, tmp_path):
    vecs = _mk_vecs()
    _write_embeddings(spark, tmp_path, vecs)
    got = q_ivf_sq8_recall(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _ivfsq8_ref(vecs)
    # losses decompose: recall + ivf_loss + sq8_loss == 1 per query
    for r in got:
        assert _r(r["recall_at5"] + r["ivf_loss"] + r["sq8_loss"]) == 1.0
        assert r["n_overlap"] <= r["exact_in_cell"]


def test_ivfsq8_single_cell_no_ivf_loss(spark, tmp_path):
    # one cell: cell restriction is vacuous, ivf_loss must be 0 and
    # recall equals the pure-SQ8 recall
    vecs = [(vid, v, 0) for vid, v, _ in _mk_vecs(n=40)]
    _write_embeddings(spark, tmp_path, vecs)
    got = q_ivf_sq8_recall(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _ivfsq8_ref(vecs)
    assert all(r["ivf_loss"] == 0.0 for r in got)
    assert all(r["exact_in_cell"] == _IVFSQ8_K for r in got)


# ------------------------------------------------------- fold stability


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _gate(t):
    return 1.0 if sum(_md5u("w:%d" % (_md5u(w) % 4096)) % 2001 - 1000
                      for w in _toks(t)) >= 0 else 0.0


def _write_docs(spark, path, rows):
    """rows: (doc_id, text)"""
    spark.createDataFrame(
        [(i, t, "en", "s", 10) for i, t in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _fold_ref(rows):
    fd = defaultdict(lambda: [0.0, 0.0])
    for i, t in rows:
        f = _md5u(str(i)) % 5
        fd[f][0] += 1
        fd[f][1] += _gate(t)
    nn = sum(v[0] for v in fd.values())
    nf = float(len(fd))
    p = sum(v[1] for v in fd.values()) / nn
    chi2 = sum((v[1] - v[0] * p) ** 2 / max(v[0] * p * (1 - p), 1e-9)
               for v in fd.values())
    rates = [v[1] / v[0] for v in fd.values()]
    df = nf - 1
    crit = df * (1 - 2 / (9 * df) + 1.6449 * math.sqrt(2 / (9 * df))) ** 3
    verdict = "fold_heterogeneous" if chi2 > crit else "gate_stable"
    return (int(nn), int(nf), _r(p), _r(min(rates)), _r(max(rates)),
            _r(chi2), _r(crit), _r(chi2 / df), verdict)


_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
          " lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def test_fold_stability_random_folds_stable(spark, tmp_path):
    rows = [(i, " ".join(_WORDS[(i + j) % len(_WORDS)]
                         for j in range(3 + i % 5)))
            for i in range(1, 301)]
    _write_docs(spark, tmp_path, rows)
    got = q_fold_stability_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _fold_ref(rows)
    assert got[0]["n_folds"] == 5


def test_fold_stability_clustered_corpus_fires(spark, tmp_path):
    # doc text depends on md5(doc_id) % 5 — the fold key itself — so
    # folds are maximally heterogeneous (per-fold unanimity)
    goods = [w for w in _WORDS if _gate(w) == 1.0]
    bads = [w for w in _WORDS if _gate(w) == 0.0]
    rows = []
    for i in range(1, 201):
        f = _md5u(str(i)) % 5
        w = goods[f % len(goods)] if f < 2 else bads[f % len(bads)]
        rows.append((i, w))
    _write_docs(spark, tmp_path, rows)
    r = q_fold_stability_audit(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _fold_ref(rows)
    assert r["verdict"] == "fold_heterogeneous"
    assert r["dispersion_ratio"] > 5


# ------------------------------------------------------------ QI curve


def _write_events(spark, path, ev):
    spark.createDataFrame(
        [(e, u, t, ts, 1.0) for e, u, t, ts in ev],
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _qi_ref(ev):
    cellsets = {1: defaultdict(lambda: [0.0, set()]),
                2: defaultdict(lambda: [0.0, set()]),
                3: defaultdict(lambda: [0.0, set()])}
    for _e, u, t, ts in ev:
        h, dw = ts.hour, ts.isoweekday() - 1
        for lvl, key in ((1, (t,)), (2, (t, h)), (3, (t, h, dw))):
            cellsets[lvl][key][0] += 1
            cellsets[lvl][key][1].add(u)
    names = {1: "type", 2: "type+hour", 3: "type+hour+dow"}
    out = []
    for lvl in (1, 2, 3):
        cs = cellsets[lvl]
        ne = sum(c for c, _ in cs.values())
        risky = [(c, us) for c, us in cs.values() if len(us) < 5]
        out.append((lvl, names[lvl], len(cs), len(risky),
                    _r(sum(c for c, _ in risky) / ne),
                    min(len(us) for _, us in cs.values())))
    return out


def _mk_qi_events():
    base = datetime.datetime(2024, 3, 4, 0, 0)
    ev, eid = [], 0
    for day in range(14):
        for u in range(1, 31):
            for rep in range((u + day) % 3):
                eid += 1
                ev.append((eid, u,
                           ["view", "click", "purchase"][(u + rep) % 3],
                           base + datetime.timedelta(
                               days=day, hours=(u * 5 + rep * 7) % 24)))
    return ev


def test_qi_curve_matches_reference(spark, tmp_path):
    ev = _mk_qi_events()
    _write_events(spark, tmp_path, ev)
    got = q_quasi_identifier_risk_curve(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _qi_ref(ev)
    # risk is monotone in QI size
    shares = [r["risky_event_share"] for r in got]
    assert shares[0] <= shares[1] <= shares[2]


def test_qi_curve_dense_traffic_safe_at_type(spark, tmp_path):
    # every user hits every type every day at the same hour: type-level
    # cells have all 30 users; hour-level collapses to few hours
    base = datetime.datetime(2024, 3, 4, 12, 0)
    ev, eid = [], 0
    for day in range(7):
        for u in range(1, 31):
            for t in ("view", "click"):
                eid += 1
                ev.append((eid, u, t, base + datetime.timedelta(days=day)))
    _write_events(spark, tmp_path, ev)
    got = q_quasi_identifier_risk_curve(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _qi_ref(ev)
    assert got[0]["n_risky_cells"] == 0
    assert got[0]["min_cell_users"] == 30


# ------------------------------------------------------------ plan shapes


def test_plans_bounded_no_cartesian(spark, tmp_path):
    _write_embeddings(spark, tmp_path, _mk_vecs(n=30))
    plan = q_ivf_sq8_recall(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan parquet") <= 1    # checkpointed codes
    _write_docs(spark, tmp_path,
                [(i, _WORDS[i % len(_WORDS)]) for i in range(1, 40)])
    plan = q_fold_stability_audit(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan
    _write_events(spark, tmp_path, _mk_qi_events()[:200])
    plan = q_quasi_identifier_risk_curve(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
    assert "Expand" in plan or "expand" in plan   # grouping-sets plan
    assert "CartesianProduct" not in plan
