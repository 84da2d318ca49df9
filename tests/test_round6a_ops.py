"""Round-5 batch-55 operators on crafted inputs, verified against
independent Python computations: mrr_eval (aspect-recall MRR over the
fused BM25 ordering), chatterjee_xi_daily (tie-adjusted xi rank
correlation, both directions), bartlett_variance (corrected k-sample
variance homogeneity)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_bartlett_variance,
    q_chatterjee_xi_daily,
    q_mrr_eval,
)

_EPOCH = dt.datetime(2024, 3, 4)


def _write_docs(spark, path, rows):
    """rows: (doc_id, text, source)"""
    spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_two_type_days(spark, path, a_counts, b_counts,
                         ta="click", tb="view"):
    rows, eid = [], 0
    for d, k in enumerate(a_counts):
        for _ in range(k):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=eid),
                         eid, ta, 1.0, "{}"))
    for d, k in enumerate(b_counts):
        for _ in range(k):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=eid),
                         eid, tb, 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# -------------------------------------------------------------------- mrr_eval


def test_mrr_first_hit_per_aspect(spark, tmp_path):
    # 'spark' saturates doc 1 (rank 1); 'dup' appears only in a low-scoring
    # doc; 'scan' absent from the corpus entirely -> rr = 0 for it.
    rows = [
        (1, "spark spark spark spark spark spark", "s"),
        (2, "spark words more words", "s"),
        (3, "dup plus lots of other filler words here today", "s"),
        (4, "plain filler document with no query words", "s"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r["term"]: r for r in q_mrr_eval(spark, str(tmp_path)).collect()}
    assert set(out) == {"spark", "scan", "dup"}
    assert out["spark"]["first_hit_rank"] == 1
    assert out["spark"]["reciprocal_rank"] == 1.0
    assert out["scan"]["n_relevant"] == 0
    assert out["scan"]["first_hit_rank"] is None
    assert out["scan"]["reciprocal_rank"] == 0.0
    d = out["dup"]
    assert d["n_relevant"] == 1 and d["first_hit_rank"] >= 1
    mrr = round((1.0 + 0.0 + round(1.0 / d["first_hit_rank"], 4)) / 3, 4)
    for r in out.values():
        assert abs(r["mrr"] - mrr) < 2e-4


# ------------------------------------------------------- chatterjee_xi_daily


def _xi_ref(xs, ys, days):
    """Tie-adjusted Chatterjee xi with (x, day) walk order."""
    n = len(xs)
    order = sorted(range(n), key=lambda i: (xs[i], days[i]))
    r = [sum(1 for j in range(n) if ys[j] <= ys[i]) for i in order]
    l = [sum(1 for j in range(n) if ys[j] >= ys[i]) for i in order]
    dsum = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    lsum = sum(li * (n - li) for li in l)
    return 1.0 - n * dsum / (2.0 * lsum)


def test_xi_functional_but_nonmonotone(spark, tmp_path):
    # y = (x - 10)^2 scaled: y is a FUNCTION of x (xi_ab high) but x is
    # 2-to-1 from y (xi_ba low).  click outnumbers view -> a=click.
    xs = [4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28]
    ys = [max(1, (x - 16) ** 2 // 4) for x in xs]
    _write_two_type_days(spark, tmp_path, xs, ys)
    row = q_chatterjee_xi_daily(spark, str(tmp_path)).collect()[0]
    assert (row["type_a"], row["type_b"]) == ("click", "view")
    assert row["n_days"] == len(xs)
    days = list(range(len(xs)))
    assert row["xi_a_to_b"] == round(
        _xi_ref([float(x) for x in xs], [float(y) for y in ys], days), 4)
    assert row["xi_b_to_a"] == round(
        _xi_ref([float(y) for y in ys], [float(x) for x in xs], days), 4)
    assert row["xi_a_to_b"] > row["xi_b_to_a"]


def test_xi_with_ties_matches_reference(spark, tmp_path):
    xs = [5, 5, 9, 9, 3, 7, 7, 2, 11, 11]
    ys = [2, 4, 4, 8, 2, 6, 6, 2, 9, 9]
    _write_two_type_days(spark, tmp_path, xs, ys)
    row = q_chatterjee_xi_daily(spark, str(tmp_path)).collect()[0]
    days = list(range(len(xs)))
    assert row["xi_a_to_b"] == round(
        _xi_ref([float(x) for x in xs], [float(y) for y in ys], days), 4)
    assert row["xi_b_to_a"] == round(
        _xi_ref([float(y) for y in ys], [float(x) for x in xs], days), 4)


# --------------------------------------------------------- bartlett_variance


def _bartlett_ref(groups):
    ns = [len(g) for g in groups]
    k = len(groups)
    n = sum(ns)
    s2 = []
    for g in groups:
        m = sum(g) / len(g)
        s2.append(sum((v - m) ** 2 for v in g) / (len(g) - 1))
    sp2 = sum((nj - 1) * s2j for nj, s2j in zip(ns, s2)) / (n - k)
    t = (n - k) * math.log(sp2) - sum(
        (nj - 1) * math.log(s2j) for nj, s2j in zip(ns, s2))
    c = 1.0 + (sum(1.0 / (nj - 1) for nj in ns) - 1.0 / (n - k)) \
        / (3.0 * (k - 1))
    return t / c, max(s2) / min(s2), math.sqrt(sp2)


def test_bartlett_exact_formula(spark, tmp_path):
    groups = {
        "a": [100, 110, 120, 130, 140],          # sd ~ 15.8
        "b": [95, 125, 155, 185, 215, 245],      # much wider
        "c": [50, 52, 54, 56],                   # tight
    }
    rows, did = [], 0
    for s in sorted(groups):
        for n in groups[s]:
            did += 1
            rows.append((did, "x" * n, s))
    _write_docs(spark, tmp_path, rows)
    stat, ratio, psd = _bartlett_ref(list(groups[s] for s in sorted(groups)))
    r = q_bartlett_variance(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 15 and r["k_sources"] == 3 and r["df"] == 2
    assert r["bartlett_stat"] == round(stat, 4)
    assert r["var_ratio_maxmin"] == round(ratio, 4)
    assert r["pooled_sd"] == round(psd, 2)


def test_bartlett_equal_variances_near_zero(spark, tmp_path):
    # identical spread in both sources -> statistic ~ 0
    rows = []
    for i, n in enumerate([10, 20, 30, 40]):
        rows.append((i + 1, "x" * n, "a"))
        rows.append((i + 101, "x" * n, "b"))
    _write_docs(spark, tmp_path, rows)
    r = q_bartlett_variance(spark, str(tmp_path)).collect()[0]
    assert abs(r["bartlett_stat"]) < 1e-9
    assert r["var_ratio_maxmin"] == 1.0
    # singleton sources are excluded (variance undefined)
    rows.append((999, "x" * 77, "lonely"))
    _write_docs(spark, tmp_path, rows)
    r2 = q_bartlett_variance(spark, str(tmp_path)).collect()[0]
    assert r2["k_sources"] == 2
