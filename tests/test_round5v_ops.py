"""Round-5 batch-31 operators on crafted inputs, verified against
independent Python computations: cochran_armitage_trend (dose-response z
on banded purchase rates), source_diversity_indices (Shannon/Simpson/
Hill/evenness), runs_test_randomness (Wald-Wolfowitz runs z)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_cochran_armitage_trend,
    q_runs_test_randomness,
    q_source_diversity_indices,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_events(spark, path, rows):
    # rows: (event_type, value) -> sequential ids/timestamps
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=i), 1, et, v, "{}")
         for i, (et, v) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=i),
                         1, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, source_counts):
    rows, i = [], 0
    for s, c in source_counts.items():
        for _ in range(c):
            i += 1
            rows.append((i, "t", "en", s, 10))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------- cochran_armitage_trend


def _python_ca(bands):
    # bands: {score: (n, purchases)}
    nn = sum(n for n, _ in bands.values())
    rr = sum(r for _, r in bands.values())
    pbar = rr / nn
    rs = sum(s * r for s, (_, r) in bands.items())
    ns = sum(s * n for s, (n, _) in bands.items())
    nss = sum(s * s * n for s, (n, _) in bands.items())
    num = rs - pbar * ns
    var = pbar * (1 - pbar) * (nss - ns * ns / nn)
    return pbar, num / math.sqrt(var)


def test_ca_detects_rising_dose_response(spark, tmp_path):
    # bands 0/1/2 (values 10/60/110): purchase rates 10% / 30% / 60%
    bands = {0: (40, 4), 1: (40, 12), 2: (40, 24)}
    rows = []
    for s, (n, r) in bands.items():
        v = 10.0 + 50 * s
        rows += [("purchase", v)] * r + [("view", v)] * (n - r)
    _write_events(spark, tmp_path, rows)
    pbar, z = _python_ca(bands)
    r = q_cochran_armitage_trend(spark, str(tmp_path)).collect()[0]
    assert (r["n_bands"], r["n_events"]) == (3, 120)
    assert r["pooled_rate"] == round(pbar, 4)
    assert r["ca_z"] == round(z, 4)
    assert r["ca_chi2"] == round(z * z, 4)
    assert r["trend"] == "up" and z > 1.96


def test_ca_flat_rates_show_no_trend(spark, tmp_path):
    rows = []
    for s in (0, 1, 2):
        v = 10.0 + 50 * s
        rows += [("purchase", v)] * 10 + [("view", v)] * 30
    _write_events(spark, tmp_path, rows)
    r = q_cochran_armitage_trend(spark, str(tmp_path)).collect()[0]
    assert r["ca_z"] == 0.0
    assert r["trend"] == "none"


def test_ca_falling_rates_trend_down(spark, tmp_path):
    bands = {0: (40, 24), 1: (40, 12), 2: (40, 4)}
    rows = []
    for s, (n, r) in bands.items():
        v = 10.0 + 50 * s
        rows += [("purchase", v)] * r + [("view", v)] * (n - r)
    _write_events(spark, tmp_path, rows)
    r = q_cochran_armitage_trend(spark, str(tmp_path)).collect()[0]
    assert r["trend"] == "down"


# ----------------------------------------------------- source_diversity_indices


def test_diversity_uniform_mix_is_maximal(spark, tmp_path):
    _write_docs(spark, tmp_path, {"a": 10, "b": 10, "c": 10, "d": 10})
    r = q_source_diversity_indices(spark, str(tmp_path)).collect()[0]
    assert (r["n_sources"], r["n_docs"]) == (4, 40)
    assert r["shannon_h"] == round(math.log(4), 4)
    assert r["simpson_lambda"] == 0.25
    assert r["hill_1"] == 4.0
    assert r["hill_2"] == 4.0
    assert r["evenness"] == 1.0


def test_diversity_dominant_source_collapses_hill(spark, tmp_path):
    counts = {"big": 97, "s1": 1, "s2": 1, "s3": 1}
    _write_docs(spark, tmp_path, counts)
    n = sum(counts.values())
    ps = [c / n for c in counts.values()]
    h = -sum(p * math.log(p) for p in ps)
    lam = sum(p * p for p in ps)
    r = q_source_diversity_indices(spark, str(tmp_path)).collect()[0]
    assert r["shannon_h"] == round(h, 4)
    assert r["simpson_lambda"] == round(lam, 4)
    assert r["hill_1"] == round(math.exp(h), 4)
    assert r["hill_2"] == round(1 / lam, 4)
    assert r["evenness"] == round(h / math.log(4), 4)
    # 4 nominal sources, barely more than 1 effective
    assert r["hill_2"] < 1.1


def test_diversity_single_source_guards(spark, tmp_path):
    _write_docs(spark, tmp_path, {"only": 5})
    r = q_source_diversity_indices(spark, str(tmp_path)).collect()[0]
    assert r["shannon_h"] == 0.0
    assert r["hill_1"] == 1.0
    assert r["evenness"] is None   # ln(1) = 0 -> guarded NULL


# -------------------------------------------------------- runs_test_randomness


def _python_runs(counts):
    n = len(counts)
    med = sorted(counts)[math.ceil(n / 2) - 1]
    signs = [c > med for c in counts if c != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    er = 2 * n1 * n2 / (n1 + n2) + 1
    vr = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
          / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
    return n1, n2, runs, er, (runs - er) / math.sqrt(vr)


def test_runs_regime_series_fails_randomness(spark, tmp_path):
    # 6 low days then 6 high days -> 2 runs, far below expectation
    counts = [10, 11, 12, 10, 11, 12, 30, 31, 32, 30, 31, 32]
    _write_daily_counts(spark, tmp_path, counts)
    n1, n2, runs, er, z = _python_runs(counts)
    r = q_runs_test_randomness(spark, str(tmp_path)).collect()[0]
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
    assert r["expected_runs"] == round(er, 4)
    assert r["z"] == round(z, 4)
    assert bool(r["random_ok"]) is False and z < -1.96


def test_runs_alternating_series_matches_python(spark, tmp_path):
    counts = [10, 30, 11, 31, 12, 32, 10, 30, 11, 31]
    _write_daily_counts(spark, tmp_path, counts)
    n1, n2, runs, er, z = _python_runs(counts)
    r = q_runs_test_randomness(spark, str(tmp_path)).collect()[0]
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
    assert r["z"] == round(z, 4)
    # maximal alternation -> runs above expectation
    assert r["n_runs"] > r["expected_runs"]


def test_runs_median_days_are_excluded(spark, tmp_path):
    # median value 20 appears twice; those days drop out entirely
    counts = [10, 20, 30, 20, 11, 31]
    _write_daily_counts(spark, tmp_path, counts)
    n1, n2, runs, er, z = _python_runs(counts)
    r = q_runs_test_randomness(spark, str(tmp_path)).collect()[0]
    assert r["n_above"] + r["n_below"] == 4
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
