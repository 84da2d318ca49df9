"""Round-5 batch-29 operators on crafted inputs, verified against
independent Python computations: stratified_kfold_plan (hash-fold
balance audit), mcnemar_filter_pair (discordant-cell chi-square),
spearman_rank_corr (mid-rank Spearman vs raw Pearson)."""

from __future__ import annotations

import hashlib
import math
import statistics

from pdf_extractor_spark.queries import (
    _KFOLD_K,
    _MCNEMAR_DIGIT_MAX,
    _MCNEMAR_LEN_MIN,
    q_mcnemar_filter_pair,
    q_spearman_rank_corr,
    q_stratified_kfold_plan,
)


def _write_docs(spark, path, rows):
    # rows: (doc_id, text, lang, n_chars)
    spark.createDataFrame(
        [(i, t, g, "s", n) for i, t, g, n in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _fold(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % _KFOLD_K


# -------------------------------------------------------- stratified_kfold_plan


def test_kfold_assignment_matches_md5_and_shares(spark, tmp_path):
    rows = [(i, "t", "en" if i % 3 else "fr", 100 + i) for i in range(1, 101)]
    _write_docs(spark, tmp_path, rows)
    out = {r["fold"]: r for r in
           q_stratified_kfold_plan(spark, str(tmp_path)).collect()}
    expect = {}
    for i, _, g, n in rows:
        expect.setdefault(_fold(i), []).append((g, n))
    assert set(out) == set(expect)
    total = sum(len(v) for v in expect.values())
    for f, members in expect.items():
        r = out[f]
        assert r["n_docs"] == len(members)
        assert r["size_share"] == round(len(members) / total, 4)
        assert r["n_langs"] == len({g for g, _ in members})
        mean = sum(n for _, n in members) / len(members)
        assert r["mean_chars"] == round(mean, 2)
    assert sum(r["n_docs"] for r in out.values()) == 100


def test_kfold_balanced_input_has_small_chi2(spark, tmp_path):
    # one language only -> chi2 exactly 0, chars_dev vs global mean
    rows = [(i, "t", "en", 100) for i in range(1, 51)]
    _write_docs(spark, tmp_path, rows)
    for r in q_stratified_kfold_plan(spark, str(tmp_path)).collect():
        assert r["chi2_vs_pooled"] == 0.0
        assert r["max_share_dev"] == 0.0
        assert r["chars_dev"] == 0.0   # every doc same length


# --------------------------------------------------------- mcnemar_filter_pair


def test_mcnemar_cells_and_chi2(spark, tmp_path):
    # craft the 2x2: ka = len >= 200, kb = digit density <= 0.2
    long_clean = "w" * 250                     # ka T, kb T
    long_digits = "1" * 250                    # ka T, kb F
    short_clean = "w" * 50                     # ka F, kb T
    short_digits = "1" * 50                    # ka F, kb F
    rows = ([(i, long_clean, "en", 250) for i in range(1, 5)]        # 4
            + [(i, long_digits, "en", 250) for i in range(5, 12)]    # 7
            + [(i, short_clean, "en", 50) for i in range(12, 14)]    # 2
            + [(i, short_digits, "en", 50) for i in range(14, 17)])  # 3
    _write_docs(spark, tmp_path, rows)
    r = q_mcnemar_filter_pair(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["both_keep"], r["only_len"],
            r["only_digit"], r["neither"]) == (16, 4, 7, 2, 3)
    assert r["agreement"] == round(7 / 16, 4)
    chi2 = (abs(7 - 2) - 1) ** 2 / (7 + 2)
    assert r["mcnemar_chi2"] == round(chi2, 4)
    assert bool(r["filters_differ"]) == (chi2 > 3.8415)
    assert _MCNEMAR_LEN_MIN == 200 and _MCNEMAR_DIGIT_MAX == 0.2


def test_mcnemar_no_discordance_is_null_not_crash(spark, tmp_path):
    # filters always agree -> b + c = 0 -> chi2 NULL, differ False
    rows = [(1, "w" * 250, "en", 250), (2, "1" * 50, "en", 50)]
    _write_docs(spark, tmp_path, rows)
    r = q_mcnemar_filter_pair(spark, str(tmp_path)).collect()[0]
    assert (r["only_len"], r["only_digit"]) == (0, 0)
    assert r["mcnemar_chi2"] is None
    assert bool(r["filters_differ"]) is False


# ----------------------------------------------------------- spearman_rank_corr


def _spearman_midrank(xs, ys):
    def midranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        ranks = [0.0] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vs[order[j + 1]] == vs[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks
    rx, ry = midranks(xs), midranks(ys)
    return statistics.correlation(rx, ry)


def test_spearman_perfect_monotone_nonlinear(spark, tmp_path):
    # digit density strictly increases with length but nonlinearly:
    # spearman = 1, pearson < 1
    rows = []
    for i, (n, digits) in enumerate(
            [(100, 1), (200, 4), (400, 30), (800, 300)], 1):
        text = "1" * digits + "w" * (n - digits)
        rows.append((i, text, "en", n))
    _write_docs(spark, tmp_path, rows)
    r = q_spearman_rank_corr(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 4
    assert r["spearman_rho"] == 1.0
    assert r["pearson_raw"] < 1.0


def test_spearman_midrank_ties_match_python(spark, tmp_path):
    # duplicate lengths and densities force mid-rank handling
    spec = [(100, 0), (100, 10), (200, 10), (200, 40), (300, 0), (300, 60)]
    rows = []
    xs, ys = [], []
    for i, (n, digits) in enumerate(spec, 1):
        text = "1" * digits + "w" * (n - digits)
        rows.append((i, text, "en", n))
        xs.append(float(n))
        ys.append(round(digits / n, 3))
    _write_docs(spark, tmp_path, rows)
    r = q_spearman_rank_corr(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 6
    assert r["n_x_values"] == 3
    assert r["spearman_rho"] == round(_spearman_midrank(xs, ys), 4)


def test_spearman_constant_density_guards_to_null(spark, tmp_path):
    rows = [(1, "w" * 100, "en", 100), (2, "w" * 200, "en", 200)]
    _write_docs(spark, tmp_path, rows)
    r = q_spearman_rank_corr(spark, str(tmp_path)).collect()[0]
    assert r["n_y_values"] == 1      # zero digit density everywhere
    assert r["spearman_rho"] is None  # zero variance -> NULL, not crash
    assert r["pearson_raw"] is None
