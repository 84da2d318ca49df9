"""Round-5 batch-36 operators on crafted inputs, verified against
independent Python computations: hoeffding_d_daily (rank/dominance D vs
a direct O(n²) walk, incl. the V-shape case Pearson/Spearman miss),
seasonal_mann_kendall (within-stratum S and tie-corrected variance vs a
sequential pair walk), goodman_kruskal_gamma (concordance over the
contingency cells vs direct enumeration with a replicated ntile).
Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_goodman_kruskal_gamma,
    q_hoeffding_d_daily,
    q_seasonal_mann_kendall,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_orders(spark, path, rows):
    """rows: (o_totalprice, o_orderpriority)."""
    spark.createDataFrame(
        [(i, i % 7 + 1, "O", float(p), _EPOCH, pr)
         for i, (p, pr) in enumerate(rows, 1)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _two_type_events(ca, cb):
    rows = []
    for d in sorted(set(ca) | set(cb)):
        rows.extend((1, d * 86400 + i, "view") for i in range(ca.get(d, 0)))
        rows.extend((1, d * 86400 + 40000 + i, "click")
                    for i in range(cb.get(d, 0)))
    return rows


# --------------------------------------------------------- hoeffding_d_daily


def _midranks(vals):
    out = []
    for v in vals:
        le = sum(1 for w in vals if w <= v)
        eq = sum(1 for w in vals if w == v)
        out.append(le - (eq - 1) / 2.0)
    return out


def _hoeffding_expected(xa, yb, type_a, type_b):
    n = float(len(xa))
    r = _midranks(xa)
    s = _midranks(yb)
    q = [
        sum(1 for j in range(len(xa))
            if xa[j] < xa[i] and yb[j] < yb[i])
        for i in range(len(xa))
    ]
    d1 = sum(qi * (qi - 1) for qi in q)
    d2 = sum((ri - 1) * (ri - 2) * (si - 1) * (si - 2)
             for ri, si in zip(r, s))
    d3 = sum((ri - 2) * (si - 2) * qi for ri, si, qi in zip(r, s, q))
    d = (30.0 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
         / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4)))
    verdict = "dependent_signal" if d > 0.05 else "independence_consistent"
    return (type_a, type_b, int(n), round(d, 6), verdict)


def test_hoeffding_v_shape_detected(spark, tmp_path):
    """yb = |xa - center|: Pearson/Spearman ~ 0 by symmetry, but D sees
    the functional dependence."""
    base = [10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36]
    ca = {d: c for d, c in enumerate(base)}
    cb = {d: abs(c - 23) + 100 for d, c in ca.items()}   # V around center
    _write_events(spark, tmp_path, _two_type_events(ca, cb))
    got = q_hoeffding_d_daily(spark, str(tmp_path)).collect()
    assert len(got) == 1
    # click gets +100/day -> busiest -> xa; view is yb
    xa = [float(cb[d]) for d in sorted(ca)]
    yb = [float(ca[d]) for d in sorted(ca)]
    assert tuple(got[0]) == _hoeffding_expected(xa, yb, "click", "view")
    assert got[0].verdict == "dependent_signal"


def test_hoeffding_shuffled_independent(spark, tmp_path):
    """A deterministic low-dependence pairing (a permutation pre-picked
    for |D| < 0.01) stays near 0 and matches the Python walk exactly."""
    perm = [9, 0, 8, 6, 10, 5, 15, 7, 14, 1, 13, 2, 12, 3, 4, 11]
    ca = {d: 10 + d for d in range(16)}
    cb = {d: 40 + perm[d] for d in range(16)}
    _write_events(spark, tmp_path, _two_type_events(ca, cb))
    got = q_hoeffding_d_daily(spark, str(tmp_path)).collect()[0]
    xa = [float(cb[d]) for d in sorted(ca)]
    yb = [float(ca[d]) for d in sorted(ca)]
    assert tuple(got) == _hoeffding_expected(xa, yb, "click", "view")
    assert abs(got.hoeffding_d) < 0.05


# ----------------------------------------------------- seasonal_mann_kendall


def _smk_expected(day_counts):
    """day_counts: {day: count}."""
    strat: dict[int, list] = {}
    for d in sorted(day_counts):
        strat.setdefault(d % 7, []).append((d, float(day_counts[d])))
    s_stat = 0.0
    raw = 0.0
    tie = 0.0
    n_days = 0
    for g, items in strat.items():
        n = float(len(items))
        n_days += len(items)
        raw += n * (n - 1) * (2 * n + 5)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                diff = items[j][1] - items[i][1]
                s_stat += (diff > 0) - (diff < 0)
        by_c: dict[float, int] = {}
        for _, c in items:
            by_c[c] = by_c.get(c, 0) + 1
        tie += sum(t * (t - 1) * (2 * t + 5)
                   for t in by_c.values() if t > 1)
    var_s = (raw - tie) / 18.0
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var_s)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    trend = "up" if (s_stat > 0 and z > 1.96) else \
        "down" if (s_stat < 0 and z < -1.96) else "none"
    return (n_days, len(strat), int(s_stat), round(var_s, 4),
            round(z, 4), trend)


def test_seasonal_mk_matches_python(spark, tmp_path):
    counts = {d: 10 + (d % 7) * 8 + (3 if d in (5, 12, 19) else 0)
              for d in range(28)}
    _write_events(
        spark, tmp_path,
        [(1, d * 86400 + i, "view")
         for d, c in counts.items() for i in range(c)])
    got = q_seasonal_mann_kendall(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _smk_expected(counts)


def test_seasonal_mk_sees_drift_under_weekly_cycle(spark, tmp_path):
    """Strong weekday cycle (amplitude 40) + steady +2/day drift: the
    stratified test calls 'up' cleanly because pairs never cross
    weekday levels."""
    counts = {d: 50 + (d % 7) * 40 + 2 * d for d in range(35)}
    _write_events(
        spark, tmp_path,
        [(1, d * 86400 + i, "view")
         for d, c in counts.items() for i in range(c)])
    r = q_seasonal_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _smk_expected(counts)
    assert r.trend == "up"
    # every within-stratum pair is increasing: S = sum of C(5,2) per
    # stratum = 7 * 10
    assert r.s_stat == 70


# ---------------------------------------------------- goodman_kruskal_gamma


def _gamma_expected(rows):
    """rows: (price, priority) with orderkey = 1-based index."""
    n = len(rows)
    order = sorted(range(n), key=lambda i: (rows[i][0], i + 1))
    base, extra = divmod(n, 10)
    dec = {}
    pos = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            if pos < n:
                dec[order[pos]] = b
                pos += 1
    cells: dict[tuple, float] = {}
    for i, (_, pr) in enumerate(rows):
        key = (pr, dec[i])
        cells[key] = cells.get(key, 0.0) + 1
    conc = disc = 0.0
    items = list(cells.items())
    for (pa, da), na in items:
        for (pb, db), nb in items:
            if pb > pa and db > da:
                conc += na * nb
            elif pb > pa and db < da:
                disc += na * nb
    gamma = (conc - disc) / (conc + disc) if conc + disc else None
    if gamma is not None and abs(gamma) < 0.1:
        reading = "no_ordinal_association"
    elif gamma is not None and gamma > 0:
        reading = "urgent_orders_cost_less"
    else:
        reading = "urgent_orders_cost_more"
    return (n, int(conc), int(disc),
            round(gamma, 4) if gamma is not None else None, reading)


def test_gamma_matches_python(spark, tmp_path):
    rows = [
        (100.0 + 13 * i, f"{1 + (i * 3) % 5}-P") for i in range(40)
    ]
    _write_orders(spark, tmp_path, rows)
    got = q_goodman_kruskal_gamma(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _gamma_expected(rows)


def test_gamma_perfect_orderings(spark, tmp_path):
    """Priority digit rises exactly with price: every cross-cell pair
    concordant, gamma = 1; inverted prices flip it to -1."""
    rows = [(100.0 + i, f"{1 + i // 8}-P") for i in range(40)]
    _write_orders(spark, tmp_path, rows)
    r = q_goodman_kruskal_gamma(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _gamma_expected(rows)
    assert r.gamma == 1.0
    assert r.reading == "urgent_orders_cost_less"
    rows2 = [(1000.0 - i, f"{1 + i // 8}-P") for i in range(40)]
    _write_orders(spark, tmp_path, rows2)
    r2 = q_goodman_kruskal_gamma(spark, str(tmp_path)).collect()[0]
    assert tuple(r2) == _gamma_expected(rows2)
    assert r2.gamma == -1.0
    assert r2.reading == "urgent_orders_cost_more"


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_hoeffding_rides_checkpoint(spark):
    final = _final(q_hoeffding_d_daily(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_seasonal_mk_rides_checkpoint(spark):
    final = _final(q_seasonal_mann_kendall(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_gamma_rides_checkpoint(spark):
    final = _final(q_goodman_kruskal_gamma(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final
