"""Round-5 batch-30 operators on crafted inputs, verified against
independent Python computations: neyman_allocation (optimal stratified
budget vs proportional), chebyshev_tail_audit (observed sigma-tail mass
vs the 1/k^2 and Gaussian references), jarque_bera_lognormal (moment
algebra and the closed-form chi2(2) p-value)."""

from __future__ import annotations

import math

from pdf_extractor_spark.queries import (
    _CHEB_GRID,
    _NEYMAN_BUDGET,
    q_chebyshev_tail_audit,
    q_jarque_bera_lognormal,
    q_neyman_allocation,
)


def _write_docs(spark, path, rows):
    # rows: (source, n_chars)
    spark.createDataFrame(
        [(i, "t", "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ----------------------------------------------------------- neyman_allocation


def test_neyman_shifts_budget_to_noisy_stratum(spark, tmp_path):
    rows = ([("a", n) for n in (100, 200, 300, 400)]
            + [("b", 100)] * 4)
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in
           q_neyman_allocation(spark, str(tmp_path)).collect()}
    sd_a = math.sqrt(sum((x - 250) ** 2
                         for x in (100, 200, 300, 400)) / 3)
    a, b = out["a"], out["b"]
    assert (a["n_docs"], b["n_docs"]) == (4, 4)
    assert a["sd_chars"] == round(sd_a, 2) and b["sd_chars"] == 0.0
    assert a["share"] == b["share"] == 0.5
    # proportional: 500/500; Neyman: ALL budget to the noisy stratum
    assert a["prop_alloc"] == b["prop_alloc"] == _NEYMAN_BUDGET // 2
    assert a["neyman_alloc"] == _NEYMAN_BUDGET
    assert b["neyman_alloc"] == 0
    assert a["alloc_shift"] == _NEYMAN_BUDGET // 2
    # V_prop = .25*sd^2/500, V_ney = .25*sd^2/1000 -> gain 2x, on all rows
    assert a["design_gain"] == b["design_gain"] == 2.0


def test_neyman_equal_variance_reduces_to_proportional(spark, tmp_path):
    rows = ([("a", n) for n in (100, 300)] + [("b", n) for n in (500, 700)])
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in
           q_neyman_allocation(spark, str(tmp_path)).collect()}
    for r in out.values():
        assert r["neyman_alloc"] == r["prop_alloc"] == _NEYMAN_BUDGET // 2
        assert r["alloc_shift"] == 0
        assert r["design_gain"] == 1.0


# -------------------------------------------------------- chebyshev_tail_audit


def test_chebyshev_observed_vs_bounds(spark, tmp_path):
    xs = [100.0] * 96 + [1000.0] * 4
    _write_docs(spark, tmp_path, [("s", int(x)) for x in xs])
    w = len(xs)
    mu = sum(xs) / w
    sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / (w - 1))
    out = {r["k"]: r for r in
           q_chebyshev_tail_audit(spark, str(tmp_path)).collect()}
    assert set(out) == {k for k, _ in _CHEB_GRID}
    for k, gauss in _CHEB_GRID:
        r = out[k]
        obs = sum(1 for x in xs if abs(x - mu) > k * sd) / w
        assert r["threshold_lo"] == round(mu - k * sd, 2)
        assert r["threshold_hi"] == round(mu + k * sd, 2)
        assert r["observed_share"] == round(obs, 6)
        assert r["chebyshev_bound"] == round(1 / k ** 2, 6)
        assert r["gaussian_ref"] == gauss
        assert r["vs_gaussian"] == round(obs / gauss, 4)
        assert bool(r["heavier_than_gaussian"]) == (obs > gauss)
    # Chebyshev's theorem holds on any input
    for r in out.values():
        assert r["observed_share"] <= r["chebyshev_bound"]
    # this crafted spike IS heavier than Gaussian at k=3 but not k=2
    assert bool(out[3]["heavier_than_gaussian"]) is True
    assert bool(out[2]["heavier_than_gaussian"]) is False


def test_chebyshev_tight_distribution_has_empty_tails(spark, tmp_path):
    _write_docs(spark, tmp_path, [("s", n) for n in (99, 100, 101) * 10])
    for r in q_chebyshev_tail_audit(spark, str(tmp_path)).collect():
        assert r["observed_share"] == 0.0
        assert bool(r["heavier_than_gaussian"]) is False


# ------------------------------------------------------- jarque_bera_lognormal


def _python_jb(lengths):
    ls = [math.log(x) for x in lengths if x > 0]
    w = len(ls)
    m1 = sum(ls) / w
    m2 = sum(x ** 2 for x in ls) / w
    m3 = sum(x ** 3 for x in ls) / w
    m4 = sum(x ** 4 for x in ls) / w
    u2 = m2 - m1 ** 2
    u3 = m3 - 3 * m1 * m2 + 2 * m1 ** 3
    u4 = m4 - 4 * m1 * m3 + 6 * m1 ** 2 * m2 - 3 * m1 ** 4
    s = u3 / u2 ** 1.5
    k = u4 / u2 ** 2 - 3
    jb = w / 6 * (s ** 2 + k ** 2 / 4)
    return w, s, k, jb, math.exp(-jb / 2)


def test_jb_moment_algebra_matches_python(spark, tmp_path):
    lengths = [10, 20, 40, 80, 160, 5000, 30, 60]   # skewed in log space
    _write_docs(spark, tmp_path, [("s", n) for n in lengths])
    w, s, k, jb, p = _python_jb(lengths)
    r = q_jarque_bera_lognormal(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == w
    assert r["skewness"] == round(s, 4)
    assert r["excess_kurtosis"] == round(k, 4)
    assert r["jb_stat"] == round(jb, 4)
    assert r["p_value"] == round(p, 6)
    assert bool(r["lognormal_ok"]) == (p > 0.05)


def test_jb_geometric_ladder_is_log_symmetric(spark, tmp_path):
    # exact geometric progression -> log lengths equally spaced -> S = 0
    lengths = [10, 100, 1000, 10000, 100000]
    _write_docs(spark, tmp_path, [("s", n) for n in lengths])
    r = q_jarque_bera_lognormal(spark, str(tmp_path)).collect()[0]
    assert r["skewness"] == 0.0
    # uniform-in-log is platykurtic, not leptokurtic
    assert r["excess_kurtosis"] < 0
    assert bool(r["lognormal_ok"]) is True   # tiny n -> JB small


def test_jb_excludes_nonpositive_lengths(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [("s", 0)] + [("s", n) for n in (10, 100, 1000)])
    r = q_jarque_bera_lognormal(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 3
