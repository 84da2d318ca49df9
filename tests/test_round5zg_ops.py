"""Round-5 batch-35 operators on crafted inputs, verified against
independent Python computations: tail_dependence_daily (joint exceedance
/ lift / empirical lambda_U vs direct quantile algebra),
turning_points_test (Kendall turning-point count vs a sequential walk),
expected_cost_gate (cost-sensitive threshold sweep vs a dict fold over
the exact classifier + heuristic definitions).  Plan pins at the
bottom."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

import numpy as np

from pdf_extractor_spark.queries import (
    _GATE_C_FN,
    _GATE_C_FP,
    q_expected_cost_gate,
    q_tail_dependence_daily,
    q_turning_points_test,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ---------------------------------------------------- tail_dependence_daily


def _td_expected(counts_a, counts_b, type_a, type_b):
    """counts: {day: n} for the two (already busiest) types."""
    days = sorted(set(counts_a) | set(counts_b))
    xa = [float(counts_a.get(d, 0)) for d in days]
    yb = [float(counts_b.get(d, 0)) for d in days]
    n = len(days)
    out = []
    for u in (0.75, 0.9):
        qa = float(np.percentile(xa, u * 100))
        qb = float(np.percentile(yb, u * 100))
        pa = sum(1 for x in xa if x > qa) / n
        pb = sum(1 for y in yb if y > qb) / n
        pj = sum(1 for x, y in zip(xa, yb) if x > qa and y > qb) / n
        out.append((
            type_a, type_b, n, u, round(qa, 2), round(qb, 2),
            round(pj, 4),
            round(pj / (pa * pb), 4) if pa * pb else None,
            round(pj / pa, 4) if pa else None,
        ))
    return out


def test_tail_dependence_coupled_spikes(spark, tmp_path):
    """view and click spike on the SAME days: joint exceedance ~ the
    marginal, lift >> 1, lambda_U -> 1."""
    base = [10, 12, 11, 10, 13, 12, 11, 10, 12, 11, 10, 12,
            11, 13, 10, 11, 12, 10, 60, 70]
    ca = {d: c for d, c in enumerate(base)}
    cb = {d: c + 2 for d, c in enumerate(base)}     # co-spiking
    rows = []
    for d in ca:
        rows.extend((1, d * 86400 + i, "view") for i in range(ca[d]))
        rows.extend((1, d * 86400 + 40000 + i, "click")
                    for i in range(cb[d]))
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_tail_dependence_daily(spark, str(tmp_path)).collect()]
    # rank-1 (xa) is click: +2 every day makes it the busiest
    assert got == _td_expected(cb, ca, "click", "view")
    # spikes co-occur
    by_u = {r[3]: r for r in got}
    assert by_u[0.9][8] == 1.0          # lambda_U at u=0.9
    assert by_u[0.9][7] > 5.0           # lift over independence


def test_tail_dependence_independent_spikes(spark, tmp_path):
    """Spike days disjoint between the two types: joint exceedance at
    u=0.9 is zero -> lift 0, lambda_U 0."""
    ca = {d: (80 if d in (18, 19) else 10 + d % 3) for d in range(20)}
    cb = {d: (81 if d in (0, 1) else 11 + (d + 1) % 3) for d in range(20)}
    rows = []
    for d in range(20):
        rows.extend((1, d * 86400 + i, "view") for i in range(ca[d]))
        rows.extend((1, d * 86400 + 40000 + i, "click")
                    for i in range(cb[d]))
    _write_events(spark, tmp_path, rows)
    rows_out = {r.u: r for r in
                q_tail_dependence_daily(spark, str(tmp_path)).collect()}
    assert rows_out[0.9].p_joint == 0.0
    assert rows_out[0.9].lambda_u == 0.0


# ------------------------------------------------------ turning_points_test


def _tp_expected(day_counts):
    xs = [float(c) for c in day_counts]
    n = len(xs)
    t = sum(
        1 for i in range(1, n - 1)
        if (xs[i] - xs[i - 1]) * (xs[i + 1] - xs[i]) < 0
    )
    e = 2.0 * (n - 2) / 3.0
    sd = math.sqrt((16.0 * n - 29.0) / 90.0)
    z = (t - e) / sd
    verdict = ("persistent_trending" if z < -1.96
               else "over_oscillating" if z > 1.96
               else "iid_consistent")
    return (n, t, round(e, 4), round(sd, 4), round(z, 4), verdict)


def _events_for_counts(day_counts):
    rows = []
    for d, c in enumerate(day_counts):
        rows.extend((1, d * 86400 + i, "view") for i in range(c))
    return rows


def test_turning_points_match_python(spark, tmp_path):
    counts = [10, 14, 9, 22, 15, 18, 25, 13, 30, 17, 21, 12, 19, 16]
    _write_events(spark, tmp_path, _events_for_counts(counts))
    got = q_turning_points_test(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _tp_expected(counts)


def test_turning_points_monotone_is_persistent(spark, tmp_path):
    """Strict ramp: zero turns, deeply negative z.  A plateau step
    (tie) is conservatively not a turn."""
    counts = list(range(10, 24))
    _write_events(spark, tmp_path, _events_for_counts(counts))
    r = q_turning_points_test(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tp_expected(counts)
    assert r.turning_points == 0
    assert r.verdict == "persistent_trending"
    counts2 = [10, 15, 15, 10, 10, 15, 15, 10, 10, 15, 15, 10]
    _write_events(spark, tmp_path, _events_for_counts(counts2))
    r2 = q_turning_points_test(spark, str(tmp_path)).collect()[0]
    assert tuple(r2) == _tp_expected(counts2)


def test_turning_points_alternation_over_oscillates(spark, tmp_path):
    counts = [10, 30] * 8
    _write_events(spark, tmp_path, _events_for_counts(counts))
    r = q_turning_points_test(spark, str(tmp_path)).collect()[0]
    assert r.turning_points == len(counts) - 2
    assert r.verdict == "over_oscillating"


# ------------------------------------------------------- expected_cost_gate


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _gate_expected(texts):
    buckets: dict[int, list[int]] = {}
    for t in texts:
        toks = _toks(t)
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000 for w in toks)
        prob = round(
            1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(toks), 1)))), 4)
        b = min(int(prob * 10), 9)
        punct = len(re.findall(r"[.!?,;:]", t))
        ok = (200 <= len(t) <= 50000
              and 0.005 <= punct / max(len(t), 1) <= 0.2)
        cell = buckets.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += int(ok)
    all_ok = sum(ok for _, ok in buckets.values())
    rows = []
    kept_n = kept_ok = 0
    for b in sorted(buckets, reverse=True):
        kept_n += buckets[b][0]
        kept_ok += buckets[b][1]
        fp = kept_n - kept_ok
        fn = all_ok - kept_ok
        rows.append([b, kept_n, fp, fn,
                     round(_GATE_C_FP * fp + _GATE_C_FN * fn, 2)])
    best = min((cost, b) for b, _, _, _, cost in rows)
    return sorted(
        (b, k, fp, fn, cost, (cost, b) == best)
        for b, k, fp, fn, cost in rows
    )


def test_expected_cost_gate_matches_python(spark, tmp_path):
    texts = [
        ("alpha beta gamma. " * 20)[:250],
        ("delta epsilon zeta, " * 30)[:400],
        "short snippet.",
        ("eta theta iota " * 40)[:500],
        ("kappa lam mu. nu xi omicron? " * 15)[:320],
        ("pi rho sigma! " * 25)[:290],
        "tau upsilon phi chi psi omega " * 3,
        ("one two three four. " * 18)[:280],
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    got = [tuple(r) for r in
           q_expected_cost_gate(spark, str(tmp_path)).collect()]
    assert got == _gate_expected(texts)
    assert sum(1 for r in got if r[5]) == 1       # exactly one argmin


def test_expected_cost_gate_lowest_threshold_keeps_all(spark, tmp_path):
    """The lowest observed decile keeps every doc: fn = 0 there, and
    kept_docs equals the corpus size."""
    texts = [("word. " * 50)[:260], "tiny.", ("a b c. " * 60)[:300]]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    rows = q_expected_cost_gate(spark, str(tmp_path)).collect()
    lowest = min(rows, key=lambda r: r.threshold_decile)
    assert lowest.kept_docs == len(texts)
    assert lowest.false_negatives == 0


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_tail_dependence_rides_checkpoint(spark):
    final = _final(q_tail_dependence_daily(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_turning_points_single_scan(spark):
    final = _final(q_turning_points_test(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_expected_cost_gate_rides_checkpoint(spark):
    final = _final(q_expected_cost_gate(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final
