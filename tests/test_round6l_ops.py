"""Round-5 batch-65 operators on crafted inputs, verified against
independent Python computations: hopkins_clusterability
(md5-deterministic uniform/real probe NN ratio), nemenyi_critical
_difference (CD-diagram pairs after Friedman), partition_spec_whatif
(GROUPING SETS three-spec layout audit).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from collections import Counter

from pdf_extractor_spark.queries import (
    _HOP_PROBES,
    _NEMENYI_Q2,
    _PSW_SMALL_ROWS,
    q_hopkins_clusterability,
    q_nemenyi_critical_difference,
    q_partition_spec_whatif,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _rn(x, n):
    """Engine round(double, n): HALF_UP on the exact binary value."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))



def _write_emb(spark, path, vecs):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_events(spark, path, rows):
    """rows: (day, event_type, user_id, n_copies)"""
    out, eid = [], 0
    for day, et, uid, n in rows:
        for _ in range(n):
            eid += 1
            out.append((eid, _EPOCH + dt.timedelta(days=day, seconds=eid),
                        uid, et, 1.0, "{}"))
    spark.createDataFrame(
        out,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _md5u(s, lo=0):
    return int(hashlib.md5(s.encode()).hexdigest()[lo:lo + 8], 16)


# ----------------------------------------------------------------- hopkins


def _f32(v):
    import numpy as np

    return [float(np.float32(x)) for x in v]


def _hopkins_ref(vecs):
    vecs = [_f32(v) for v in vecs]
    d = len(vecs[0])
    mins = [min(v[j] for v in vecs) for j in range(d)]
    maxs = [max(v[j] for v in vecs) for j in range(d)]
    synth = []
    for i in range(1, _HOP_PROBES + 1):
        p = [mins[j] + (_md5u(f"hu:{i}:{j}") / 4294967296.0)
             * (maxs[j] - mins[j]) for j in range(d)]
        synth.append(p)
    order = sorted(range(len(vecs)),
                   key=lambda vid: (hashlib.md5(
                       f"{vid}:hop".encode()).hexdigest(), vid))
    real = order[:_HOP_PROBES]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    su = sum(math.sqrt(min(d2(v, p) for v in vecs)) for p in synth)
    sw = sum(math.sqrt(min(d2(vecs[v], vecs[r])
                           for v in range(len(vecs)) if v != r))
             for r in real)
    h = su / (su + sw)
    verdict = ("clusterable" if h > 0.75
               else "weakly_clustered" if h > 0.55 else "uniform_like")
    return (len(vecs), _HOP_PROBES, round(su, 4), round(sw, 4),
            round(h, 4), verdict)


def test_hopkins_matches_reference(spark, tmp_path):
    # two tight clusters in 4-d -> strongly clusterable
    vecs = ([[0.0, 0.0, 0.0, 0.0],
             [0.01, 0.0, 0.01, 0.0],
             [0.0, 0.02, 0.0, 0.01]] * 7
            + [[5.0, 5.0, 5.0, 5.0],
               [5.01, 5.0, 5.02, 5.0],
               [5.0, 5.01, 5.0, 5.02]] * 7)
    vecs = [[x + 0.001 * i for x in v] for i, v in enumerate(vecs)]
    _write_emb(spark, tmp_path, vecs)
    got = q_hopkins_clusterability(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _hopkins_ref(vecs)
    assert got[0]["verdict"] == "clusterable"


def test_hopkins_grid_is_uniform_like(spark, tmp_path):
    # a regular 2-d lattice: NN distances from uniform probes are on
    # the same scale as from real points -> H near 0.5
    vecs = [[float(a), float(b)] for a in range(7) for b in range(7)]
    _write_emb(spark, tmp_path, vecs)
    r = q_hopkins_clusterability(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _hopkins_ref(vecs)
    assert r["hopkins_h"] < 0.75
    assert r["verdict"] in ("uniform_like", "weakly_clustered")


# ----------------------------------------------------------------- nemenyi


def _nemenyi_ref(day_counts):
    days = sorted({d for d, _ in day_counts})
    types = sorted({t for _, t in day_counts})
    k, n = len(types), float(len(days))

    def midrank(vals):
        return [sum(1 for w in vals if w < v)
                + (sum(1 for w in vals if w == v) + 1) / 2.0
                for v in vals]

    mr = Counter()
    for d in days:
        vals = [day_counts.get((d, t), 0.0) for t in types]
        for t, r in zip(types, midrank(vals)):
            mr[t] += r
    mbar = {t: mr[t] / n for t in types}
    cd = _NEMENYI_Q2[k] * math.sqrt(k * (k + 1) / (6.0 * n))
    out = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            diff = mbar[a] - mbar[b]
            out.append((a, b, round(mbar[a], 4), round(mbar[b], 4),
                        round(diff, 4), round(cd, 4), abs(diff) > cd))
    return out


def test_nemenyi_matches_reference(spark, tmp_path):
    rows, counts = [], {}
    for d in range(12):
        for j, t in enumerate(["buy", "click", "view"]):
            c = [2, 6, 11][j] + (d * (j + 2)) % 3
            rows.append((d, t, 1, c))
            counts[(d, t)] = float(c)
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_nemenyi_critical_difference(spark, str(tmp_path)).collect()]
    assert got == _nemenyi_ref(counts)
    # view always beats buy -> that pair must be significant
    by = {(a, b): s for a, b, *_, s in got}
    assert by[("buy", "view")] is True


def test_nemenyi_interchangeable_pair(spark, tmp_path):
    # two types alternate winning; the third always loses
    rows, counts = [], {}
    for d in range(10):
        a, b = (8, 5) if d % 2 == 0 else (5, 8)
        for t, c in (("alpha", a), ("beta", b), ("gamma", 1)):
            rows.append((d, t, 1, c))
            counts[(d, t)] = float(c)
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_nemenyi_critical_difference(spark, str(tmp_path)).collect()]
    assert got == _nemenyi_ref(counts)
    by = {(a, b): s for a, b, *_, s in got}
    assert by[("alpha", "beta")] is False     # statistically tied
    assert by[("alpha", "gamma")] is True


# ------------------------------------------------------ partition what-if


def _psw_ref(rows):
    """rows: (day, event_type, user_id, n_copies)"""
    daily, dtype, ub = Counter(), Counter(), Counter()
    for day, et, uid, n in rows:
        daily[day] += n
        dtype[(day, et)] += n
        ub[_md5u(str(uid)) % 16] += n

    def qtl(vals, p):
        vals = sorted(vals)
        if len(vals) == 1:
            return float(vals[0])
        h = (len(vals) - 1) * p
        lo = int(math.floor(h))
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (h - lo) * (vals[hi] - vals[lo])

    out = []
    for spec, cnt in (("daily", daily), ("daily_type", dtype),
                      ("user_bucket16", ub)):
        vals = [float(v) for v in cnt.values()]
        tot = sum(vals)
        p50, p99 = qtl(vals, 0.5), qtl(vals, 0.99)
        small = [v for v in vals if v < _PSW_SMALL_ROWS]
        out.append((spec, len(vals), int(tot), _rn(p50, 1),
                    _rn(p99, 1), _rn(max(vals) / p50, 2),
                    len(small), _rn(sum(small) / tot, 4)))
    return out


def test_psw_matches_reference(spark, tmp_path):
    rows = []
    for d in range(6):
        for j, t in enumerate(["view", "click"]):
            rows.append((d, t, 100 + d * 2 + j, 30 + 25 * d * (j + 1)))
    # plus a burst day
    rows.append((2, "view", 777, 900))
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_partition_spec_whatif(spark, str(tmp_path)).collect()]
    assert got == _psw_ref(rows)
    specs = {g[0]: g for g in got}
    # all three specs conserve total rows
    assert len({g[2] for g in got}) == 1
    # day x type at least as many partitions as daily
    assert specs["daily_type"][1] >= specs["daily"][1]


def test_psw_small_partition_detection(spark, tmp_path):
    # one big day + many tiny days: daily spec shows small partitions
    rows = [(0, "a", 1, 5000)] + [(d, "a", 1, 10) for d in range(1, 9)]
    _write_events(spark, tmp_path, rows)
    got = {r["spec"]: r for r in
           q_partition_spec_whatif(spark, str(tmp_path)).collect()}
    assert [tuple(r) for r in sorted(
        got.values(), key=lambda r: r["spec"])] == _psw_ref(rows)
    assert got["daily"]["small_partitions"] == 8
    assert got["daily"]["skew_max_over_p50"] > 100


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_emb(spark, tmp_path,
               [[float(a), float(b)] for a in range(4) for b in range(4)])
    _write_events(spark, tmp_path,
                  [(d, t, d * 3 + 1, 3 + d % 4)
                   for d in range(6) for t in ("x", "y")])
    for fn, mx in ((q_hopkins_clusterability, 3),
                   (q_nemenyi_critical_difference, 1),
                   (q_partition_spec_whatif, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
