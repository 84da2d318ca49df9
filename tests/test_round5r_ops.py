"""Round-5 batch-27 operators on crafted inputs, verified against
independent Python computations: theil_inequality (Theil-T between/within
decomposition), cusum_count_monitor (prefix-min identity vs the textbook
recursion), unseen_vocab_mass (Good-Turing mass + Chao1 richness)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _CUSUM_H,
    _CUSUM_K,
    q_cusum_count_monitor,
    q_theil_inequality,
    q_unseen_vocab_mass,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, n) for i, (s, t, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append(
                (eid, _EPOCH + dt.timedelta(days=d, seconds=i), 1,
                 "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------ theil_inequality


def test_theil_zero_when_all_lengths_equal(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [("a", "x", 50), ("a", "y", 50), ("b", "z", 50)])
    r = q_theil_inequality(spark, str(tmp_path)).collect()[0]
    assert (r["n_docs"], r["n_sources"]) == (3, 2)
    assert r["theil_total"] == 0.0
    assert r["theil_between"] == 0.0
    assert r["theil_within"] == 0.0
    assert r["between_share"] is None  # 0/0 guarded to NULL


def test_theil_pure_between_source_inequality(spark, tmp_path):
    # within each source all docs equal -> within = 0, share = 1
    _write_docs(spark, tmp_path,
                [("a", "t", 100), ("a", "t", 100),
                 ("b", "t", 300), ("b", "t", 300)])
    r = q_theil_inequality(spark, str(tmp_path)).collect()[0]
    between = 0.25 * math.log(100 / 200) + 0.75 * math.log(300 / 200)
    assert r["theil_within"] == 0.0
    assert r["theil_between"] == round(between, 4)
    assert r["theil_total"] == round(between, 4)
    assert r["between_share"] == 1.0


def test_theil_decomposition_adds_up(spark, tmp_path):
    # mixed: unequal within AND between; verify T = between + within
    # against a from-scratch Python computation
    rows = [("a", "t", 10), ("a", "t", 90), ("b", "t", 200), ("b", "t", 400)]
    _write_docs(spark, tmp_path, rows)
    xs = [float(n) for _, _, n in rows]
    mu = sum(xs) / len(xs)
    total = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    groups = {"a": [10.0, 90.0], "b": [200.0, 400.0]}
    s = sum(xs)
    between = sum(
        (sum(g) / s) * math.log((sum(g) / len(g)) / mu)
        for g in groups.values())
    within = sum(
        (sum(g) / s)
        * (sum((x / (sum(g) / len(g)))
               * math.log(x / (sum(g) / len(g))) for x in g) / len(g))
        for g in groups.values())
    r = q_theil_inequality(spark, str(tmp_path)).collect()[0]
    assert r["theil_total"] == round(total, 4)
    assert r["theil_between"] == round(between, 4)
    assert r["theil_within"] == round(within, 4)
    assert abs(r["theil_between"] + r["theil_within"]
               - r["theil_total"]) <= 2e-4
    # share is derived from the rounded terms (cross-engine determinism)
    assert r["between_share"] == round(round(between, 4) / round(total, 4), 4)


def test_theil_excludes_zero_length_docs(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [("a", "t", 100), ("a", "", 0), ("b", "t", 100)])
    r = q_theil_inequality(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 2
    assert r["theil_total"] == 0.0


# --------------------------------------------------------- cusum_count_monitor


def _python_cusum(counts):
    """Textbook recursion the SQL prefix identity must reproduce."""
    nd = len(counts)
    bn = math.ceil(nd / 2)
    burn = counts[:bn]
    mu = sum(burn) / bn
    sd = math.sqrt(sum((c - mu) ** 2 for c in burn) / (bn - 1))
    s, out = 0.0, []
    for c in counts:
        s = max(0.0, s + (c - mu) / sd - _CUSUM_K)
        out.append(round(s, 4))
    return bn, mu, sd, out


def test_cusum_matches_textbook_recursion(spark, tmp_path):
    # dips below zero AND a sustained shift, so both the max(0, .) clamp
    # and the alarm path are exercised
    counts = [10, 12, 8, 11, 9, 5, 30, 30, 2, 30]
    _write_daily_counts(spark, tmp_path, counts)
    bn, mu, sd, s = _python_cusum([float(c) for c in counts])
    r = q_cusum_count_monitor(spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["burn_days"]) == (10, bn)
    assert r["ref_mean"] == round(mu, 4)
    assert r["ref_sd"] == round(sd, 4)
    assert r["max_cusum"] == max(s)
    alarms = [d for d, v in enumerate(s) if v > _CUSUM_H]
    assert r["alarm_days"] == len(alarms)
    assert r["first_alarm_day"] == alarms[0]
    assert r["alarm_days"] > 0  # the shift was detected


def test_cusum_quiet_series_never_alarms(spark, tmp_path):
    counts = [10, 12, 8, 11, 9, 10, 11, 9, 12, 10]
    _write_daily_counts(spark, tmp_path, counts)
    _, _, _, s = _python_cusum([float(c) for c in counts])
    r = q_cusum_count_monitor(spark, str(tmp_path)).collect()[0]
    assert r["max_cusum"] == max(s)
    assert r["alarm_days"] == 0
    assert r["first_alarm_day"] is None


def test_cusum_constant_burnin_degrades_to_null(spark, tmp_path):
    # sd = 0 -> z undefined -> NULL cusum, zero alarms (both engines)
    _write_daily_counts(spark, tmp_path, [10, 10, 10, 10, 10, 25])
    r = q_cusum_count_monitor(spark, str(tmp_path)).collect()[0]
    assert r["ref_sd"] == 0.0
    assert r["max_cusum"] is None
    assert r["alarm_days"] == 0
    assert r["first_alarm_day"] is None


# ----------------------------------------------------------- unseen_vocab_mass


def test_good_turing_and_chao1_on_known_counts(spark, tmp_path):
    # tokens: a x3, b x2, c x1, d x1 -> N=7, V=4, N1=2, N2=1
    _write_docs(spark, tmp_path,
                [("s", "a a a b", 7), ("s", "b c d", 5)])
    r = q_unseen_vocab_mass(spark, str(tmp_path)).collect()[0]
    assert (r["n_tokens"], r["vocab_size"]) == (7, 4)
    assert (r["hapax_types"], r["dis_types"]) == (2, 1)
    assert r["p_unseen_gt"] == round(2 / 7, 6)
    assert r["coverage_gt"] == round(1 - 2 / 7, 6)
    # chao1 = 4 + 2*1 / (2*(1+1)) = 4.5
    assert r["chao1_richness"] == 4.5
    assert r["undiscovered_ratio"] == round(0.5 / 4, 4)


def test_tokenization_is_lowercased_alnum(spark, tmp_path):
    # "A-b!" and "a b" tokenize identically -> a x2, b x2 -> no hapax
    _write_docs(spark, tmp_path, [("s", "A-b!", 4), ("s", "a b", 3)])
    r = q_unseen_vocab_mass(spark, str(tmp_path)).collect()[0]
    assert (r["n_tokens"], r["vocab_size"]) == (4, 2)
    assert r["hapax_types"] == 0
    assert r["p_unseen_gt"] == 0.0
    assert r["chao1_richness"] == 2.0
