"""Round-5 batch-76 operators on crafted inputs, verified against
independent Python computations: fligner_killeen_scale (normal-scores
robust k-sample scale test, Acklam inverse-CDF), delong_auc_ci
(nonparametric AUC variance/CI), rowgroup_size_plan (parquet row-group
sizing decision table).  Plan pins at the bottom."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from pdf_extractor_spark.queries import (
    _QNORM_A,
    _QNORM_B,
    _QNORM_C,
    _QNORM_D,
    _QNORM_PHIGH,
    q_delong_auc_ci,
    q_fligner_killeen_scale,
    q_rowgroup_size_plan,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _qnorm(p):
    a, b, c, d = _QNORM_A, _QNORM_B, _QNORM_C, _QNORM_D
    assert 0.5 < p < 1
    if p <= _QNORM_PHIGH:
        q = p - 0.5
        r = q * q
        return ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                  + a[4]) * r + a[5]) * q
                / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                    + b[4]) * r + 1))
    u = math.sqrt(-2.0 * math.log(1.0 - p))
    return (-(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u
              + c[4]) * u + c[5])
            / ((((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1))


def test_qnorm_approximation_accuracy():
    # pin the approximation against known quantiles (both branches)
    assert abs(_qnorm(0.975) - 1.959963985) < 1e-6
    assert abs(_qnorm(0.841344746) - 1.0) < 1e-6      # central branch
    assert abs(_qnorm(0.99) - 2.326347874) < 1e-6     # tail branch
    assert abs(_qnorm(0.999) - 3.090232306) < 1e-6


def _write_docs(spark, path, rows):
    """rows: (text, lang, source, n_chars)"""
    spark.createDataFrame(
        [(i, t, l, s, n) for i, (t, l, s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# --------------------------------------------------------- fligner-killeen


def _fk_ref(rows):
    by_src = defaultdict(list)
    for (_t, _l, s, n) in rows:
        by_src[s].append(float(n))

    def med(xs):
        xs = sorted(xs)
        mid = (len(xs) - 1) / 2
        lo, hi = xs[int(math.floor(mid))], xs[int(math.ceil(mid))]
        return lo + (hi - lo) * (mid - math.floor(mid))

    devs = []
    for s, xs in by_src.items():
        m = med(xs)
        devs.extend((s, abs(x - m)) for x in xs)
    alld = sorted(d for _, d in devs)
    n = len(devs)

    def midrank(v):
        lo = sum(1 for x in alld if x < v)
        eq = sum(1 for x in alld if x == v)
        return lo + (eq + 1) / 2.0

    scores = [(s, _qnorm(0.5 + midrank(d) / (2 * (n + 1))))
              for s, d in devs]
    abar = sum(a for _, a in scores) / n
    var = sum((a - abar) ** 2 for _, a in scores) / (n - 1)
    fk = sum(
        len([a for s2, a in scores if s2 == s])
        * (sum(a for s2, a in scores if s2 == s)
           / len([a for s2, a in scores if s2 == s]) - abar) ** 2
        for s in by_src) / var
    k = len(by_src)
    df = k - 1
    crit = df * (1 - 2 / (9 * df) + 1.6449 * math.sqrt(2 / (9 * df))) ** 3
    verdict = "scales_differ" if fk > crit else "scales_consistent"
    return (n, k, _r(fk), df, _r(crit), verdict)


def _spread_rows(scales):
    rows = []
    for si, (s, scale) in enumerate(scales):
        for i in range(22):
            n = 300 + ((i * 37) % 21 - 10) * scale
            rows.append(("w", "en", s, n))
    return rows


def test_fk_detects_spread_difference(spark, tmp_path):
    rows = _spread_rows([("a", 2), ("b", 40), ("c", 6)])
    _write_docs(spark, tmp_path, rows)
    got = q_fligner_killeen_scale(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _fk_ref(rows)
    assert got[0]["verdict"] == "scales_differ"


def test_fk_same_spread_consistent(spark, tmp_path):
    # identical spread, shifted medians: location shifts must NOT fire
    rows = []
    for s, shift in [("a", 0), ("b", 500), ("c", 2000)]:
        for i in range(20):
            rows.append(("w", "en", s, shift + 100 + (i * 31) % 60))
    _write_docs(spark, tmp_path, rows)
    r = q_fligner_killeen_scale(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _fk_ref(rows)
    assert r["verdict"] == "scales_consistent"


def test_fk_heavy_ties(spark, tmp_path):
    rows = ([("w", "en", "a", 100)] * 8 + [("w", "en", "a", 200)] * 8
            + [("w", "en", "b", 140)] * 9 + [("w", "en", "b", 160)] * 9)
    _write_docs(spark, tmp_path, rows)
    r = q_fligner_killeen_scale(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _fk_ref(rows)


# ------------------------------------------------------------------ DeLong


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _prob(text):
    ts = _toks(text)
    sc = sum(_md5u("w:%d" % (_md5u(tok) % 4096)) % 2001 - 1000
             for tok in ts)
    return round(1.0 / (1.0 + math.exp(-sc / (1000.0 * max(len(ts), 1)))),
                 4)


def _delong_ref(rows):
    pos = [_prob(t) for t, l, _s, _n in rows if l == "en"]
    neg = [_prob(t) for t, l, _s, _n in rows if l != "en"]
    n1, n0 = len(pos), len(neg)

    def v10(x):
        return (sum(1 for y in neg if y < x)
                + 0.5 * sum(1 for y in neg if y == x)) / n0

    def v01(y):
        return (sum(1 for x in pos if x > y)
                + 0.5 * sum(1 for x in pos if x == y)) / n1

    auc = sum(v10(x) for x in pos) / n1
    s10 = sum((v10(x) - auc) ** 2 for x in pos) / (n1 - 1)
    s01 = sum((v01(y) - auc) ** 2 for y in neg) / (n0 - 1)
    se = math.sqrt(s10 / n1 + s01 / n0)
    z = (auc - 0.5) / se if se > 0 else None
    if se == 0:
        verdict = ("auc_differs_from_chance" if auc != 0.5
                   else "auc_consistent_with_chance")
    else:
        verdict = ("auc_differs_from_chance" if abs(z) > 1.96
                   else "auc_consistent_with_chance")
    return (n1, n0, _r(auc), _r(se), _r(auc - 1.96 * se),
            _r(auc + 1.96 * se), _r(z) if z is not None else None, verdict)


_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
          " lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def test_delong_matches_reference(spark, tmp_path):
    rows = []
    for i in range(48):
        t = " ".join(_WORDS[(i + j) % len(_WORDS)]
                     for j in range(3 + i % 5))
        rows.append((t, "en" if i % 3 != 0 else "fr", "s", 10))
    _write_docs(spark, tmp_path, rows)
    got = q_delong_auc_ci(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _delong_ref(rows)


def test_delong_separable_fires(spark, tmp_path):
    # put the highest-scoring words exclusively on English docs
    scored = sorted(_WORDS, key=lambda w: _prob(w))
    lo, hi = scored[:6], scored[-6:]
    rows = []
    for i in range(20):
        rows.append((" ".join(hi[(i + j) % 6] for j in range(4)),
                     "en", "s", 10))
        rows.append((" ".join(lo[(i + j) % 6] for j in range(4)),
                     "fr", "s", 10))
    _write_docs(spark, tmp_path, rows)
    r = q_delong_auc_ci(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _delong_ref(rows)
    assert r["auc"] > 0.9
    assert r["verdict"] == "auc_differs_from_chance"
    assert r["auc_lo95"] > 0.5


# ---------------------------------------------------------- rowgroup plan


def _rg_ref(rows):
    n = len(rows)
    rb = sum(8 + len(t.encode()) + len(l.encode()) + len(s.encode()) + 8
             for t, l, s, _n in rows) / n
    tb = sum(len(t.encode()) for t, _l, _s, _n in rows) / n
    out = []
    for mb in (16, 64, 128):
        rpg = max(math.floor(mb * 1048576.0 / rb), 1.0)
        out.append((mb, n, _r(rb, 1), int(rpg), int(math.ceil(n / rpg)),
                    _r(rpg * (rb - tb) / 1048576.0, 3),
                    _r(rpg * rb / 1048576.0, 3),
                    _r(tb / rb)))
    return out


def test_rowgroup_plan_matches_reference(spark, tmp_path):
    rows = [("x" * (50 + i % 400), "en", f"s{i % 3}", 10)
            for i in range(60)]
    _write_docs(spark, tmp_path, rows)
    got = q_rowgroup_size_plan(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _rg_ref(rows)
    # monotone: bigger targets, more rows per group, fewer groups
    assert got[0]["rows_per_rowgroup"] < got[2]["rows_per_rowgroup"]
    assert got[0]["n_rowgroups"] >= got[2]["n_rowgroups"]


def test_rowgroup_plan_unicode_octets(spark, tmp_path):
    # multi-byte text: octet model must count UTF-8 bytes, not chars
    rows = [("漢字テキスト" * (1 + i % 5), "ja", "s", 5) for i in range(30)]
    _write_docs(spark, tmp_path, rows)
    got = q_rowgroup_size_plan(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in got] == _rg_ref(rows)
    assert got[0]["bytes_per_row"] > 8 + 6 * 5 + 2 + 1 + 8  # > char count


# ------------------------------------------------------------ plan shapes


def test_plans_bounded_no_cartesian(spark, tmp_path):
    rows = _spread_rows([("a", 3), ("b", 9)])
    _write_docs(spark, tmp_path, rows)
    for fn, cap in ((q_fligner_killeen_scale, 2),
                    (q_delong_auc_ci, 1),
                    (q_rowgroup_size_plan, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= cap, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
