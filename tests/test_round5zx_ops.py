"""Round-5 batch-52 operators on crafted inputs, verified against
independent Python computations: mood_median_test (2xk chi-square on
the grand-median split), ansari_bradley_scale (rank scale test with
exact conditional moments), cox_stuart_trend (half-offset sign test)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from pdf_extractor_spark.queries import (
    q_ansari_bradley_scale,
    q_cox_stuart_trend,
    q_mood_median_test,
)

_EPOCH = dt.datetime(2024, 3, 4)


def _write_lens(spark, path, per_source):
    """per_source: {source: [n_chars, ...]} — text is a filler of that
    length so the table shape matches the canonical documents schema."""
    rows, did = [], 0
    for s in sorted(per_source):
        for n in per_source[s]:
            did += 1
            rows.append((did, "x" * int(n), "en", s, int(n)))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_daily_counts(spark, path, counts):
    """counts[d] events on day d, deterministic contents."""
    rows, eid = [], 0
    for d, k in enumerate(counts):
        for _ in range(k):
            eid += 1
            rows.append(
                (eid, _EPOCH + dt.timedelta(days=d, seconds=eid), eid,
                 "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _weighted_median(vals):
    vs = sorted(vals)
    n = len(vs)
    lo = vs[math.floor((n + 1) / 2.0) - 1]
    hi = vs[math.ceil((n + 1) / 2.0) - 1]
    return (lo + hi) / 2.0


# ------------------------------------------------------------ mood_median_test


def _mood_ref(per_source):
    pooled = [v for vs in per_source.values() for v in vs]
    gmed = _weighted_median(pooled)
    n = float(len(pooled))
    a = sum(1.0 for v in pooled if v > gmed)
    chi2 = 0.0
    min_exp = float("inf")
    for vs in per_source.values():
        nj = float(len(vs))
        aj = sum(1.0 for v in vs if v > gmed)
        ea, eb = nj * a / n, nj * (n - a) / n
        chi2 += (aj - ea) ** 2 / ea + ((nj - aj) - eb) ** 2 / eb
        min_exp = min(min_exp, nj * min(a, n - a) / n)
    return gmed, a / n, chi2, min_exp, math.sqrt(chi2 / n)


def test_mood_exact_formula(spark, tmp_path):
    per = {
        "a": [10, 20, 30, 40, 500, 600],
        "b": [35, 45, 55, 65, 75],
        "c": [5, 6, 7, 80, 90, 100, 110],
    }
    _write_lens(spark, tmp_path, per)
    gmed, share, chi2, min_exp, v = _mood_ref(per)
    r = q_mood_median_test(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_docs"] == 18 and row["k_sources"] == 3 and row["df"] == 2
    assert row["grand_median"] == round(gmed, 2)
    assert row["share_above"] == round(share, 4)
    assert row["chi2_stat"] == round(chi2, 4)
    assert row["min_expected"] == round(min_exp, 2)
    assert row["cramers_v"] == round(v, 4)


def test_mood_identical_sources_zero(spark, tmp_path):
    # same length multiset in both sources -> aj proportional to nj
    per = {"a": [10, 20, 30, 40], "b": [10, 20, 30, 40]}
    _write_lens(spark, tmp_path, per)
    row = q_mood_median_test(spark, str(tmp_path)).collect()[0]
    assert row["chi2_stat"] == 0.0
    assert row["cramers_v"] == 0.0


# -------------------------------------------------------- ansari_bradley_scale


def _ab_ref(a_vals, b_vals):
    med_a, med_b = _weighted_median(a_vals), _weighted_median(b_vals)
    ca = [v - med_a for v in a_vals]
    cb = [v - med_b for v in b_vals]
    pooled = sorted(ca + cb)
    n = len(pooled)
    # mid-ranks then AB scores
    cnt = Counter(pooled)
    r, cum = {}, 0.0
    for v in sorted(cnt):
        t = cnt[v]
        r[v] = cum + (t + 1) / 2.0
        cum += t
    s = {v: min(rv, n + 1 - rv) for v, rv in r.items()}
    ab = sum(s[v] for v in ca)
    sbar = sum(s[v] for v in pooled) / n
    ss = sum((s[v] - sbar) ** 2 for v in pooled)
    var = len(ca) * len(cb) / (n * (n - 1.0)) * ss
    z = (ab - len(ca) * sbar) / math.sqrt(var)
    mad_a = sum(abs(v) for v in ca) / len(ca)
    mad_b = sum(abs(v) for v in cb) / len(cb)
    return ab, len(ca) * sbar, z, mad_a / mad_b


def test_ansari_bradley_exact_formula(spark, tmp_path):
    # a (6 docs) is the larger source -> source_a; b has wider spread
    a_vals = [48, 49, 50, 50, 51, 52]
    b_vals = [10, 30, 50, 70, 90]
    _write_lens(spark, tmp_path, {"a": a_vals, "b": b_vals})
    ab, exp, z, ratio = _ab_ref(a_vals, b_vals)
    row = q_ansari_bradley_scale(spark, str(tmp_path)).collect()[0]
    assert (row["source_a"], row["source_b"]) == ("a", "b")
    assert (row["n_a"], row["n_b"]) == (6, 5)
    assert row["ab_stat"] == round(ab, 2)
    assert row["ab_expected"] == round(exp, 2)
    assert row["z_stat"] == round(z, 4)
    assert row["meanad_ratio"] == round(ratio, 4)
    # a is tighter than b: its centered values sit mid-pool where AB
    # scores are LARGE, so the statistic must exceed its null mean
    assert row["ab_stat"] > row["ab_expected"]
    assert row["meanad_ratio"] < 1.0


def test_ansari_bradley_picks_two_largest_and_single_source_empty(
        spark, tmp_path):
    _write_lens(spark, tmp_path, {
        "big": [10] * 5 + [20] * 5,
        "mid": [1, 2, 3, 4],
        "tiny": [7, 8],
    })
    row = q_ansari_bradley_scale(spark, str(tmp_path)).collect()[0]
    assert (row["source_a"], row["source_b"]) == ("big", "mid")
    _write_lens(spark, tmp_path, {"only": [1, 2, 3]})
    assert q_ansari_bradley_scale(spark, str(tmp_path)).count() == 0


# ------------------------------------------------------------ cox_stuart_trend


def _cs_ref(counts):
    n = len(counts)
    m = math.ceil(n / 2.0)
    pairs = [(counts[i], counts[i + m]) for i in range(n - m)]
    pos = sum(1 for x, y in pairs if y > x)
    neg = sum(1 for x, y in pairs if y < x)
    tie = len(pairs) - pos - neg
    npn = pos + neg
    z = 0.0
    if npn > 0:
        z = (max(pos, neg) - npn / 2.0 - 0.5) / math.sqrt(npn / 4.0)
    return len(pairs), pos, neg, tie, z


def test_cox_stuart_exact_even(spark, tmp_path):
    counts = [3, 5, 2, 8, 6, 9, 4, 12]  # n=8, m=4 -> 4 pairs
    _write_daily_counts(spark, tmp_path, counts)
    np_, pos, neg, tie, z = _cs_ref(counts)
    row = q_cox_stuart_trend(spark, str(tmp_path)).collect()[0]
    assert row["n_days"] == 8 and row["n_pairs"] == np_ == 4
    assert (row["n_pos"], row["n_neg"], row["n_tie"]) == (pos, neg, tie)
    assert row["z_stat"] == round(z, 4)
    assert row["direction"] == "increasing"


def test_cox_stuart_odd_drops_middle_and_ties(spark, tmp_path):
    counts = [5, 7, 3, 99, 5, 2, 3]  # n=7, m=4 -> 3 pairs, middle (99) out
    _write_daily_counts(spark, tmp_path, counts)
    np_, pos, neg, tie, z = _cs_ref(counts)
    assert np_ == 3 and tie == 2  # (5,5) and (3,3) pairs tie
    row = q_cox_stuart_trend(spark, str(tmp_path)).collect()[0]
    assert row["n_days"] == 7 and row["n_pairs"] == 3
    assert (row["n_pos"], row["n_neg"], row["n_tie"]) == (pos, neg, tie)
    assert row["z_stat"] == round(z, 4)
    assert row["direction"] == "decreasing"


def test_cox_stuart_flat_is_none(spark, tmp_path):
    _write_daily_counts(spark, tmp_path, [4, 4, 4, 4])
    row = q_cox_stuart_trend(spark, str(tmp_path)).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["n_tie"]) == (0, 0, 2)
    assert row["z_stat"] == 0.0 and row["direction"] == "none"
