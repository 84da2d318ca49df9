"""Round-5 batch-61 operators on crafted inputs, verified against
independent Python computations: somers_d_ordinal (ties-aware Somers'
D both directions + tau-b over the priority x decile cells),
croston_intermittent (closed-form Croston/SBA on the rarest event
type's sparse daily demand), hjorth_parameters_daily (activity /
mobility / complexity from two difference passes).  Plan pins at the
bottom."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _CROSTON_ALPHA,
    q_croston_intermittent,
    q_hjorth_parameters_daily,
    q_somers_d_ordinal,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_events(spark, path, rows):
    """rows: (user, epoch_seconds, event_type)"""
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


# ---------------------------------------------------------------- somers D


def _somers_expected(rows):
    n = len(rows)
    order = sorted(range(n), key=lambda i: (rows[i][0], i + 1))
    base, extra = divmod(n, 10)
    dec, pos = {}, 0
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
    conc = disc = ty = tx = 0.0
    items = list(cells.items())
    for (pa, da), na in items:
        for (pb, db), nb in items:
            if (pa, da) == (pb, db):
                continue
            if pb > pa and db > da:
                conc += na * nb
            elif pb > pa and db < da:
                disc += na * nb
            if pb != pa and db == da:
                ty += na * nb / 2.0
            if pb == pa and db != da:
                tx += na * nb / 2.0
    d_yx = (conc - disc) / (conc + disc + ty) if conc + disc + ty else None
    d_xy = (conc - disc) / (conc + disc + tx) if conc + disc + tx else None
    den = math.sqrt((conc + disc + tx) * (conc + disc + ty))
    tb = (conc - disc) / den if den else None
    return (n, int(conc), int(disc), int(tx), int(ty),
            round(d_yx, 4), round(d_xy, 4), round(tb, 4))


def test_somers_matches_python(spark, tmp_path):
    rows = [(100.0 + 13 * (i * 7 % 11), f"{1 + (i * 3) % 5}-P")
            for i in range(40)]
    _write_orders(spark, tmp_path, rows)
    got = q_somers_d_ordinal(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _somers_expected(rows)


def test_somers_ties_shrink_gamma(spark, tmp_path):
    # perfect concordance across cells but massive within-cell ties:
    # gamma would read 1.0; tau-b is the geometric mean of the two
    # Somers' D, so it sits BETWEEN them
    rows = [(100.0 + i, f"{1 + i // 8}-P") for i in range(40)]
    _write_orders(spark, tmp_path, rows)
    r = q_somers_d_ordinal(spark, str(tmp_path)).collect()[0]
    ref = _somers_expected(rows)
    assert tuple(r) == ref
    d1 = abs(r["somers_d_dec_given_pr"])
    d2 = abs(r["somers_d_pr_given_dec"])
    tb = abs(r["kendall_tau_b"])
    assert min(d1, d2) - 1e-9 <= tb <= max(d1, d2) + 1e-9
    assert tb == round(math.sqrt(d1 * d2), 4)


# ----------------------------------------------------------------- croston


def _croston_expected(day_counts, et):
    a = _CROSTON_ALPHA
    days = sorted(day_counts)
    k = len(days)
    sizes = [float(day_counts[d]) for d in days]
    gaps = [float(days[i] - days[i - 1]) for i in range(1, k)]
    z = (1 - a) ** (k - 1) * sizes[0] + sum(
        a * (1 - a) ** (k - 1 - i) * sizes[i] for i in range(1, k))
    ng = len(gaps)
    p = ((1 - a) ** (ng - 1) * gaps[0]
         + sum(a * (1 - a) ** (ng - 1 - i) * gaps[i]
               for i in range(1, ng))) if ng else None
    span = days[-1] - days[0] + 1
    total = sum(sizes)
    out = {
        "event_type": et,
        "n_demands": k,
        "span_days": span,
        "mean_interval_days": round(sum(gaps) / ng, 4) if ng else None,
        "z_hat": round(z, 4),
        "p_hat": round(p, 4) if p else None,
        "croston_rate": round(z / p, 4) if p else None,
        "sba_rate": round(z / p * (1 - a / 2), 4) if p else None,
        "naive_rate": round(total / span, 4),
    }
    return out


def test_croston_matches_python(spark, tmp_path):
    # 'rare' occurs on sparse days with varying sizes; 'busy' dominates
    rare = {0: 3, 4: 1, 5: 2, 11: 4, 18: 1, 19: 2, 30: 5}
    rows = []
    for d, c in rare.items():
        rows += [(1, d * 86400 + j, "rare") for j in range(c)]
    for d in range(31):
        rows += [(1, d * 86400 + 50000 + j, "busy") for j in range(6)]
    _write_events(spark, tmp_path, rows)
    r = q_croston_intermittent(spark, str(tmp_path)).collect()
    assert len(r) == 1
    ref = _croston_expected(rare, "rare")
    for kk, v in ref.items():
        assert r[0][kk] == v, kk
    # intermittency: croston rate must sit between naive and peak size
    assert r[0]["croston_rate"] > r[0]["naive_rate"] * 0.3


def test_croston_single_demand_degenerate(spark, tmp_path):
    rows = [(1, 3 * 86400, "rare")]
    rows += [(1, d * 86400 + 50000 + j, "busy")
             for d in range(5) for j in range(4)]
    _write_events(spark, tmp_path, rows)
    r = q_croston_intermittent(spark, str(tmp_path)).collect()[0]
    assert r["n_demands"] == 1
    assert r["z_hat"] == 1.0
    assert r["p_hat"] is None and r["croston_rate"] is None


# ------------------------------------------------------------------ hjorth


def _hjorth_expected(counts):
    def var(v):
        m = sum(v) / len(v)
        return sum(x * x for x in v) / len(v) - m * m

    d1 = [counts[i] - counts[i - 1] for i in range(1, len(counts))]
    d2 = [d1[i] - d1[i - 1] for i in range(1, len(d1))]
    v0, v1, v2 = var(counts), var(d1), var(d2)
    mob = math.sqrt(v1 / v0)
    comp = math.sqrt(v2 / v1) / mob
    reading = ("narrowband_cyclic" if comp < 1.5
               else "mixed" if comp < 2.5 else "broadband_noisy")
    return (len(counts), round(v0, 4), round(mob, 4), round(comp, 4),
            round(2 * math.pi / mob, 4), reading)


def test_hjorth_matches_python(spark, tmp_path):
    counts = [20, 25, 23, 30, 27, 35, 31, 40, 33, 45, 38, 50]
    rows = [(1, d * 86400 + j, "a")
            for d, c in enumerate(counts) for j in range(c)]
    _write_events(spark, tmp_path, rows)
    got = q_hjorth_parameters_daily(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _hjorth_expected(counts)


def test_hjorth_sine_is_narrowband(spark, tmp_path):
    # sampled sine (period 8 days): complexity ~ 1
    counts = [50 + int(round(20 * math.sin(2 * math.pi * d / 8)))
              for d in range(32)]
    rows = [(1, d * 86400 + j, "a")
            for d, c in enumerate(counts) for j in range(c)]
    _write_events(spark, tmp_path, rows)
    r = q_hjorth_parameters_daily(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _hjorth_expected(counts)
    assert r["reading"] == "narrowband_cyclic"
    # the implied period should land near the true 8 days
    assert 6.0 < r["dominant_period_days"] < 11.0


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    rows = [(100.0 + 13 * i, f"{1 + (i * 3) % 5}-P") for i in range(30)]
    _write_orders(spark, tmp_path, rows)
    ev = [(1, d * 86400 + j, "a" if d % 3 else "b")
          for d in range(12) for j in range(3 + d % 4)]
    _write_events(spark, tmp_path, ev)
    for fn in (q_somers_d_ordinal, q_croston_intermittent,
               q_hjorth_parameters_daily):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
