"""Round-5 batch-63 operators on crafted inputs, verified against
independent Python computations: jonckheere_trend_ingest (brute-force
ordered U walk + 3-term tie variance), brunner_munzel_lengths
(midrank statistic vs a direct implementation of Brunner-Munzel
2000), quade_test_event_types (weighted-block rank F vs a sequential
computation).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from pdf_extractor_spark.queries import (
    _JT_GROUPS,
    q_brunner_munzel_lengths,
    q_jonckheere_trend_ingest,
    q_quade_test_event_types,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs_nchars(spark, path, rows):
    """rows: (source, n_chars); doc_id = 1-based position."""
    spark.createDataFrame(
        [(i, "x" * n, "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    """rows: (day, event_type, n_copies)"""
    out, eid = [], 0
    for day, et, n in rows:
        for _ in range(n):
            eid += 1
            out.append((eid, _EPOCH + dt.timedelta(days=day, seconds=eid),
                        eid, et, 1.0, "{}"))
    spark.createDataFrame(
        out,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ---------------------------------------------------------- jonckheere


def _jt_ref(lengths):
    n = len(lengths)
    base, extra = divmod(n, _JT_GROUPS)
    groups = []
    pos = 0
    for b in range(1, _JT_GROUPS + 1):
        size = base + (1 if b <= extra else 0)
        groups.append([float(x) for x in lengths[pos:pos + size]])
        pos += size
    j = 0.0
    for gi in range(len(groups)):
        for hi in range(gi + 1, len(groups)):
            for x in groups[gi]:
                for y in groups[hi]:
                    j += 1.0 if x < y else (0.5 if x == y else 0.0)
    ns = [len(g) for g in groups]
    nt = float(n)
    mu = (nt * nt - sum(x * x for x in ns)) / 4.0
    ties = [c for c in Counter(lengths).values() if c > 1]
    t1g = sum(x * (x - 1) * (2 * x + 5) for x in ns)
    t2g = sum(x * (x - 1) * (x - 2) for x in ns)
    t3g = sum(x * (x - 1) for x in ns)
    t1t = sum(t * (t - 1) * (2 * t + 5) for t in ties)
    t2t = sum(t * (t - 1) * (t - 2) for t in ties)
    t3t = sum(t * (t - 1) for t in ties)
    var = ((nt * (nt - 1) * (2 * nt + 5) - t1g - t1t) / 72.0
           + t2g * t2t / (36.0 * nt * (nt - 1) * (nt - 2))
           + t3g * t3t / (8.0 * nt * (nt - 1)))
    z = (j - mu) / math.sqrt(var)
    verdict = ("lengths_increasing" if z > 1.96
               else "lengths_decreasing" if z < -1.96
               else "no_ordered_trend")
    return (n, int(j), round(mu, 1), round(var, 2), round(z, 4), verdict)


def test_jt_matches_bruteforce(spark, tmp_path):
    lengths = [100 + (i * 37) % 90 + i for i in range(45)]  # mild up-trend
    _write_docs_nchars(spark, tmp_path, [("s", x) for x in lengths])
    got = q_jonckheere_trend_ingest(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _jt_ref(lengths)


def test_jt_strong_monotone_flags_up(spark, tmp_path):
    lengths = [100 + 10 * i for i in range(40)]
    _write_docs_nchars(spark, tmp_path, [("s", x) for x in lengths])
    r = q_jonckheere_trend_ingest(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _jt_ref(lengths)
    assert r["verdict"] == "lengths_increasing"
    lengths_down = list(reversed(lengths))
    _write_docs_nchars(spark, tmp_path, [("s", x) for x in lengths_down])
    r2 = q_jonckheere_trend_ingest(spark, str(tmp_path)).collect()[0]
    assert r2["verdict"] == "lengths_decreasing"


def test_jt_ties_heavy_matches(spark, tmp_path):
    lengths = [100, 100, 100, 200, 100, 200, 200, 300, 200, 300,
               300, 300, 100, 300, 400, 400, 300, 400, 400, 400]
    _write_docs_nchars(spark, tmp_path, [("s", x) for x in lengths])
    got = q_jonckheere_trend_ingest(spark, str(tmp_path)).collect()[0]
    assert tuple(got) == _jt_ref(lengths)


# ------------------------------------------------------- brunner-munzel


def _midranks(vals, universe):
    """midrank of each value in `universe` within pooled list `vals`."""
    out = {}
    for v in universe:
        less = sum(1 for w in vals if w < v)
        eq = sum(1 for w in vals if w == v)
        out[v] = less + (eq + 1) / 2.0
    return out


def _bm_ref(a, b):
    pooled = a + b
    uni = sorted(set(pooled))
    rc = _midranks(pooled, uni)
    ra = _midranks(a, uni)
    rb = _midranks(b, uni)
    n1, n2 = float(len(a)), float(len(b))
    rb1 = sum(rc[x] for x in a) / n1
    rb2 = sum(rc[x] for x in b) / n2
    s1 = sum((rc[x] - ra[x] - rb1 + (n1 + 1) / 2.0) ** 2
             for x in a) / (n1 - 1)
    s2 = sum((rc[x] - rb[x] - rb2 + (n2 + 1) / 2.0) ** 2
             for x in b) / (n2 - 1)
    pool = n1 * s1 + n2 * s2
    w = n1 * n2 * (rb2 - rb1) / ((n1 + n2) * math.sqrt(pool))
    df = pool * pool / (s1 * s1 * n1 * n1 / (n1 - 1)
                        + s2 * s2 * n2 * n2 / (n2 - 1))
    p = (rb2 - (n2 + 1) / 2.0) / n1
    verdict = ("locations_differ" if abs(w) > 1.96
               else "locations_consistent")
    return (int(n1), int(n2), round(p, 4), round(w, 4),
            round(df, 2), verdict)


def test_bm_matches_direct(spark, tmp_path):
    big = [100, 120, 120, 150, 170, 200, 200, 230, 260, 300]
    sml = [140, 150, 180, 210, 240, 280, 350]
    rows = [("big", x) for x in big] + [("sml", x) for x in sml] \
        + [("tiny", 999)]
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_brunner_munzel_lengths(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _bm_ref(big, sml)


def test_bm_shift_detected_under_unequal_variance(spark, tmp_path):
    # B shifted up with a much wider spread — the BM design case
    big = [200 + (i * 13) % 21 for i in range(20)]          # tight
    sml = [260 + ((i * 97) % 300) - 150 + 8 * i for i in range(12)]
    rows = [("big", x) for x in big] + [("sml", x) for x in sml]
    _write_docs_nchars(spark, tmp_path, rows)
    r = q_brunner_munzel_lengths(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _bm_ref(big, sml)
    assert r["p_b_gt_a"] > 0.5


# -------------------------------------------------------------- quade


def _quade_ref(day_type_counts):
    """day_type_counts: {(day, type): c} dense over days x types."""
    days = sorted({d for d, _ in day_type_counts})
    types = sorted({t for _, t in day_type_counts})
    k, n = float(len(types)), float(len(days))

    def midrank(values):
        out = []
        for v in values:
            less = sum(1 for w in values if w < v)
            eq = sum(1 for w in values if w == v)
            out.append(less + (eq + 1) / 2.0)
        return out

    r = {}
    for d in days:
        vals = [day_type_counts.get((d, t), 0.0) for t in types]
        for t, rk in zip(types, midrank(vals)):
            r[(d, t)] = rk
    ranges = [max(day_type_counts.get((d, t), 0.0) for t in types)
              - min(day_type_counts.get((d, t), 0.0) for t in types)
              for d in days]
    qs = midrank(ranges)
    s = {(d, t): qs[i] * (r[(d, t)] - (k + 1) / 2.0)
         for i, d in enumerate(days) for t in types}
    a2 = sum(v * v for v in s.values())
    sj = {t: sum(s[(d, t)] for d in days) for t in types}
    b = sum(v * v for v in sj.values()) / n
    if a2 - b == 0:
        return None
    f = (n - 1) * b / (a2 - b)
    crit = (1 - 2 / (9 * (k - 1))
            + 1.6449 * math.sqrt(2 / (9 * (k - 1)))) ** 3
    verdict = ("type_mix_ranking_real" if f > crit
               else "type_mix_ranking_noise")
    return (int(n), int(k), round(f, 4), int(k - 1),
            int((n - 1) * (k - 1)), round(crit, 4), verdict)


def test_quade_matches_direct(spark, tmp_path):
    rows = []
    counts = {}
    for d in range(10):
        for j, t in enumerate(["view", "click", "buy"]):
            c = [9, 5, 2][j] + (d * (j + 3)) % 4
            rows.append((d, t, c))
            counts[(d, t)] = float(c)
    _write_events(spark, tmp_path, rows)
    got = q_quade_test_event_types(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _quade_ref(counts)
    assert got[0]["verdict"] == "type_mix_ranking_real"


def test_quade_shuffled_ranks_read_noise(spark, tmp_path):
    # each type wins on some days with similar ranges -> F small
    pattern = [(5, 2, 3), (2, 5, 3), (3, 2, 5), (2, 3, 5), (5, 3, 2),
               (3, 5, 2), (5, 2, 3), (2, 5, 3), (3, 2, 5)]
    rows, counts = [], {}
    for d, (a, b, c) in enumerate(pattern):
        for t, cc in zip(["view", "click", "buy"], (a, b, c)):
            rows.append((d, t, cc))
            counts[(d, t)] = float(cc)
    _write_events(spark, tmp_path, rows)
    r = q_quade_test_event_types(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _quade_ref(counts)
    assert r["verdict"] == "type_mix_ranking_noise"


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    _write_docs_nchars(spark, tmp_path,
                       [("a", 100 + i * 7) for i in range(20)]
                       + [("b", 150 + i * 11) for i in range(15)])
    _write_events(spark, tmp_path,
                  [(d, t, 2 + (d + len(t)) % 3)
                   for d in range(8) for t in ("x", "y", "z")])
    for fn, mx in ((q_jonckheere_trend_ingest, 1),
                   (q_brunner_munzel_lengths, 1),
                   (q_quade_test_event_types, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
