"""Round-5 batch-58 operators on crafted inputs, verified against
independent Python computations: kpss_test (Bartlett-kernel level
stationarity), permutation_entropy_daily (order-3 Bandt-Pompe with
stable-tie ranks), engle_granger_daily (two-step residual
cointegration between the two busiest event types).  Plan pins at
the bottom."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_engle_granger_daily,
    q_kpss_test,
    q_permutation_entropy_daily,
)

_EPOCH = dt.datetime(2024, 3, 4)


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


# ------------------------------------------------------------------- KPSS


def _kpss_ref(counts, lag=5):
    n = float(len(counts))
    my = sum(counts) / n
    e = [c - my for c in counts]
    st, s = [], 0.0
    for x in e:
        s += x
        st.append(s)
    ss = sum(x * x for x in st)
    g0 = sum(x * x for x in e)
    s2lr = g0
    for j in range(1, lag + 1):
        gj = sum(e[t] * e[t - j] for t in range(j, len(e)))
        s2lr += 2.0 * (1.0 - j / (lag + 1.0)) * gj
    s2lr /= n
    stat = ss / (n * n) / s2lr
    v = ("stationary" if stat < 0.347 else
         "borderline" if stat < 0.463 else "level_nonstationary")
    return (len(counts), lag, round(stat, 4), round(s2lr, 4), v)


def test_kpss_stationary_noise(spark, tmp_path):
    # mean-reverting pseudo-noise around 20: KPSS stays tiny
    counts = [20 + ((i * 7919) % 11) - 5 for i in range(40)]
    _write_events(spark, tmp_path, [(d, "a", c) for d, c in
                                    enumerate(counts)])
    got = q_kpss_test(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _kpss_ref(counts)
    assert got[0]["verdict"] == "stationary"


def test_kpss_random_walk_rejects(spark, tmp_path):
    # a monotone drifting level: partial sums blow up vs short-run var
    counts = [10 + 3 * i + ((i * 13) % 3) for i in range(40)]
    _write_events(spark, tmp_path, [(d, "a", c) for d, c in
                                    enumerate(counts)])
    r = q_kpss_test(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _kpss_ref(counts)
    assert r["verdict"] == "level_nonstationary"


# ------------------------------------------------------ permutation entropy


def _pe_ref(counts):
    pats = []
    for t in range(2, len(counts)):
        a, b, c = counts[t - 2], counts[t - 1], counts[t]
        r0 = (1 if b < a else 0) + (1 if c < a else 0)
        r1 = (1 if a < b else 0) + (1 if c < b else 0) + (1 if a == b else 0)
        r2 = ((1 if a < c else 0) + (1 if b < c else 0)
              + (1 if a == c else 0) + (1 if b == c else 0))
        pats.append(r0 * 100 + r1 * 10 + r2)
    from collections import Counter
    cnt = Counter(pats)
    n = float(len(pats))
    ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return (len(pats), round(ent, 4), round(ent / math.log(6), 4),
            len(cnt), 6 - len(cnt), top[0], round(top[1] / n, 4))


def test_pe_monotone_is_zero_entropy(spark, tmp_path):
    counts = [10 + 2 * i for i in range(12)]   # strictly rising
    _write_events(spark, tmp_path, [(d, "a", c) for d, c in
                                    enumerate(counts)])
    r = q_permutation_entropy_daily(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _pe_ref(counts)
    assert r["perm_entropy_nats"] == 0.0
    assert r["distinct_patterns"] == 1
    assert r["forbidden_patterns"] == 5
    assert r["top_pattern_code"] == 12     # 012 = rising
    assert r["top_share"] == 1.0


def test_pe_mixed_with_ties_matches_reference(spark, tmp_path):
    counts = [5, 5, 5, 7, 3, 7, 7, 2, 9, 9, 1, 4, 4, 8]
    _write_events(spark, tmp_path, [(d, "a", c) for d, c in
                                    enumerate(counts)])
    got = q_permutation_entropy_daily(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _pe_ref(counts)
    assert 0.0 < got[0]["perm_entropy_norm"] <= 1.0


# ----------------------------------------------------------- engle-granger


def _eg_ref(xa, xb):
    n = float(len(xa))
    ma, mb = sum(xa) / n, sum(xb) / n
    caa = sum(x * x for x in xa) - n * ma * ma
    cbb = sum(x * x for x in xb) - n * mb * mb
    cab = sum(x * y for x, y in zip(xa, xb)) - n * ma * mb
    beta = cab / caa
    r2 = cab * cab / (caa * cbb)
    u = [y - (mb + beta * (x - ma)) for x, y in zip(xa, xb)]
    z = u[:-1]
    d = [u[i + 1] - u[i] for i in range(len(u) - 1)]
    szz = sum(x * x for x in z)
    rho = sum(zi * di for zi, di in zip(z, d)) / szz
    m = float(len(d))
    s2 = sum((di - rho * zi) ** 2 for zi, di in zip(z, d)) / (m - 1)
    tau = rho / math.sqrt(s2 / szz)
    return (int(n), round(beta, 4), round(r2, 4), round(tau, 4),
            tau < -3.34)


def test_eg_cointegrated_pair(spark, tmp_path):
    # xb tracks 2*xa with a mean-reverting wiggle: residual DF rejects
    xa = [20 + ((i * 17) % 7) for i in range(36)]
    xb = [2 * a + ((i * 5) % 3) - 1 for i, a in enumerate(xa)]
    rows = [(d, "busy", c) for d, c in enumerate(xa)] \
        + [(d, "second", c) for d, c in enumerate(xb)]
    # make 'busy' the busier type overall
    assert sum(xa) != sum(xb)
    a_first = sum(xa) > sum(xb)
    _write_events(spark, tmp_path, rows)
    r = q_engle_granger_daily(spark, str(tmp_path)).collect()[0]
    ref_xa, ref_xb = (xa, xb) if a_first else (xb, xa)
    n, beta, r2, tau, coint = _eg_ref(ref_xa, ref_xb)
    assert (r["type_a"], r["type_b"]) == (
        ("busy", "second") if a_first else ("second", "busy"))
    assert r["n_days"] == n
    assert r["coint_beta"] == beta
    assert r["coint_r2"] == r2
    assert r["eg_tau"] == tau
    assert bool(r["cointegrated"]) is coint
    assert coint is True


def test_eg_independent_trends_not_cointegrated(spark, tmp_path):
    # two independent near-random-walk levels: high r2, sticky residual
    xa, xb, la, lb = [], [], 50.0, 80.0
    for i in range(40):
        la += ((i * 7) % 5) - 1.6
        lb += ((i * 11) % 7) - 2.4
        xa.append(int(round(la)))
        xb.append(int(round(lb)))
    rows = [(d, "busy", c) for d, c in enumerate(xa)] \
        + [(d, "second", c) for d, c in enumerate(xb)]
    _write_events(spark, tmp_path, rows)
    r = q_engle_granger_daily(spark, str(tmp_path)).collect()[0]
    a_first = sum(xa) > sum(xb)
    ref_xa, ref_xb = (xa, xb) if a_first else (xb, xa)
    n, beta, r2, tau, coint = _eg_ref(ref_xa, ref_xb)
    assert r["eg_tau"] == tau
    assert bool(r["cointegrated"]) is coint


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    counts = [20 + ((i * 7919) % 11) for i in range(20)]
    rows = [(d, "a", c) for d, c in enumerate(counts)] \
        + [(d, "b", c + 1) for d, c in enumerate(counts)]
    _write_events(spark, tmp_path, rows)
    for fn in (q_kpss_test, q_permutation_entropy_daily,
               q_engle_granger_daily):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
