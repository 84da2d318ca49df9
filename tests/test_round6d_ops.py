"""Round-5 batch-57 operators on crafted inputs, verified against
independent Python computations: games_howell_posthoc (pairwise Welch
t + Welch-Satterthwaite df after Welch's ANOVA), dagostino_k2_lengths
(D'Agostino-Pearson omnibus with the Johnson-SU skew arm and the
Anscombe-Glynn kurtosis arm), effect_size_lengths (A12 / Cliff's
delta / Cohen's d / Hedges' g between the two largest sources).
Plan pins at the bottom."""

from __future__ import annotations

import math

from pdf_extractor_spark.queries import (
    q_dagostino_k2_lengths,
    q_effect_size_lengths,
    q_games_howell_posthoc,
)


def _write_docs_nchars(spark, path, rows):
    """rows: (source, n_chars); text is a synthetic pad of that size."""
    spark.createDataFrame(
        [(i, "x" * n, "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# -------------------------------------------------------- games-howell


def _gh_ref(groups):
    """groups: {source: [values]} -> [(sa, sb, na, nb, diff, t, df)]."""
    stats = {}
    for s, v in groups.items():
        n = len(v)
        if n < 2:
            continue
        m = sum(v) / n
        s2 = sum((x - m) ** 2 for x in v) / (n - 1)
        if s2 > 0:
            stats[s] = (float(n), m, s2)
    out = []
    ks = sorted(stats)
    for i, sa in enumerate(ks):
        for sb in ks[i + 1:]:
            na, ma, va = stats[sa]
            nb, mb, vb = stats[sb]
            qa, qb = va / na, vb / nb
            t = (ma - mb) / math.sqrt(qa + qb)
            df = (qa + qb) ** 2 / (qa * qa / (na - 1) + qb * qb / (nb - 1))
            out.append((sa, sb, int(na), int(nb),
                        round(ma - mb, 4), round(t, 4), round(df, 2)))
    return out


def test_games_howell_matches_python(spark, tmp_path):
    groups = {
        "a": [100, 110, 120, 130, 140],
        "b": [300, 340, 380, 420, 460, 500],   # far mean, wide var
        "c": [101, 109, 121, 129],             # ~ a
    }
    rows = [(s, n) for s in sorted(groups) for n in groups[s]]
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_games_howell_posthoc(spark, str(tmp_path)).collect()
    ref = _gh_ref(groups)
    assert len(got) == len(ref) == 3
    for r, (sa, sb, na, nb, diff, t, df) in zip(got, ref):
        assert (r["source_a"], r["source_b"]) == (sa, sb)
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["mean_diff"] == diff
        assert r["welch_t"] == t
        assert r["welch_df"] == df
        assert r["m_pairs"] == 3
    by = {(r["source_a"], r["source_b"]): r for r in got}
    assert by[("a", "b")]["sig_unadj"] == 1     # huge gap
    assert by[("a", "c")]["sig_unadj"] == 0     # same location


def test_games_howell_excludes_degenerate_groups(spark, tmp_path):
    # singleton source and zero-variance source contribute no pairs
    rows = ([("a", 100 + i * 7) for i in range(5)]
            + [("b", 500 + i * 11) for i in range(5)]
            + [("solo", 77)] + [("flat", 200)] * 4)
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_games_howell_posthoc(spark, str(tmp_path)).collect()
    assert {(r["source_a"], r["source_b"]) for r in got} == {("a", "b")}


# ----------------------------------------------------------- dagostino K2


def _dk2_ref(lengths):
    xs = [math.log(max(n, 1)) for n in lengths]
    n = float(len(xs))
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    g1 = m3 / m2 ** 1.5
    b2 = m4 / (m2 * m2)
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
             / ((n - 2) * (n + 5) * (n + 7) * (n + 9)))
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1))
    zs = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    eb2 = 3.0 * (n - 1) / (n + 1)
    vb2 = (24.0 * n * (n - 2) * (n - 3)
           / ((n + 1) ** 2 * (n + 3) * (n + 5)))
    sb = (6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
          * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
    xx = (b2 - eb2) / math.sqrt(vb2)
    a = 6.0 + 8.0 / sb * (2.0 / sb + math.sqrt(1 + 4 / (sb * sb)))
    zk = (((1 - 2.0 / (9 * a))
           - ((1 - 2.0 / a) / (1 + xx * math.sqrt(2.0 / (a - 4))))
           ** (1.0 / 3.0))
          / math.sqrt(2.0 / (9 * a)))
    k2 = zs * zs + zk * zk
    return (len(lengths), round(g1, 4), round(b2 - 3, 4),
            round(zs, 4), round(zk, 4), round(k2, 4),
            "non_normal" if k2 > 5.9915 else "normal_plausible")


def test_dagostino_matches_python_skewed(spark, tmp_path):
    # heavily right-skewed raw lengths -> log helps but stays skewed
    lengths = [10] * 20 + [30] * 10 + [100] * 5 + [1000, 5000, 20000]
    _write_docs_nchars(spark, tmp_path, [("a", n) for n in lengths])
    got = q_dagostino_k2_lengths(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _dk2_ref(lengths)


def test_dagostino_geometric_ladder_near_normal(spark, tmp_path):
    # log-lengths form a symmetric ladder: skew ~ 0, kurtosis mild
    lengths = ([100] + [180] * 4 + [330] * 8 + [600] * 10
               + [1100] * 8 + [2000] * 4 + [3600])
    _write_docs_nchars(spark, tmp_path, [("a", n) for n in lengths])
    r = q_dagostino_k2_lengths(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _dk2_ref(lengths)
    assert abs(r["skewness"]) < 0.2
    assert r["verdict"] == "normal_plausible"


# ---------------------------------------------------------- effect sizes


def _es_ref(a, b):
    na, nb = len(a), len(b)
    gt = sum(1 for x in a for y in b if x > y)
    eq = sum(1 for x in a for y in b if x == y)
    a12 = (gt + 0.5 * eq) / (na * nb)
    cliff = 2 * a12 - 1
    ma, mb = sum(a) / na, sum(b) / nb
    ssa = sum((x - ma) ** 2 for x in a)
    ssb = sum((x - mb) ** 2 for x in b)
    sp = math.sqrt((ssa + ssb) / (na + nb - 2))
    d = (ma - mb) / sp
    g = d * (1 - 3.0 / (4 * (na + nb) - 9))
    mag = ("negligible" if abs(cliff) < 0.147 else
           "small" if abs(cliff) < 0.33 else
           "medium" if abs(cliff) < 0.474 else "large")
    return (na, nb, round(a12, 4), round(cliff, 4),
            round(d, 4), round(g, 4), mag)


def test_effect_size_matches_brute_force(spark, tmp_path):
    big = [100, 150, 150, 200, 250, 300, 310]       # largest source
    small = [120, 150, 220, 280, 290, 400]          # second
    tiny = [999]                                     # ignored (3rd)
    rows = ([("big", n) for n in big] + [("sml", n) for n in small]
            + [("tiny", n) for n in tiny])
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_effect_size_lengths(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    na, nb, a12, cliff, d, g, mag = _es_ref(big, small)
    assert (r["source_a"], r["source_b"]) == ("big", "sml")
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["vd_a12"] == a12
    assert r["cliffs_delta"] == cliff
    assert r["cohens_d"] == d
    assert r["hedges_g"] == g
    assert r["magnitude"] == mag


def test_effect_size_stochastic_dominance(spark, tmp_path):
    # every 'big' doc longer than every 'sml' doc: A12 = 1, delta = 1
    rows = ([("big", 1000 + i) for i in range(5)]
            + [("sml", 100 + i) for i in range(4)])
    _write_docs_nchars(spark, tmp_path, rows)
    r = q_effect_size_lengths(spark, str(tmp_path)).collect()[0]
    assert r["vd_a12"] == 1.0
    assert r["cliffs_delta"] == 1.0
    assert r["magnitude"] == "large"
    assert r["cohens_d"] > 0


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    rows = [("a", 100 + i * 13 % 97) for i in range(12)] \
        + [("b", 300 + i * 7 % 53) for i in range(9)]
    _write_docs_nchars(spark, tmp_path, rows)
    for fn in (q_games_howell_posthoc, q_dagostino_k2_lengths,
               q_effect_size_lengths):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
