"""Round-5 batch-74 operators on crafted inputs, verified against
independent Python computations: hosmer_lemeshow (decile-of-risk
calibration chi-square), spiegelhalter_z (unbinned Brier calibration
z), bws_length_drift (Baumgartner-Weiss-Schindler variance-weighted
two-sample rank test).  Plan pins at the bottom."""

from __future__ import annotations

import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    q_bws_length_drift,
    q_hosmer_lemeshow,
    q_spiegelhalter_z,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _write_docs(spark, path, rows):
    """rows: (text, lang)"""
    spark.createDataFrame(
        [(i, t, l, "s", len(t)) for i, (t, l) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_nchars(spark, path, ncs):
    spark.createDataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate(ncs, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------- classifier probability


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _prob_label(text, lang):
    ts = _toks(text)
    sc = sum(_md5u("w:%d" % (_md5u(tok) % 4096)) % 2001 - 1000 for tok in ts)
    p = round(1.0 / (1.0 + math.exp(-sc / (1000.0 * max(len(ts), 1)))), 4)
    return p, 1.0 if lang == "en" else 0.0


# --------------------------------------------------------- hosmer-lemeshow


def _hl_ref(rows):
    probs = [(i, *_prob_label(t, l)) for i, (t, l) in enumerate(rows, 1)]
    pl = sorted(probs, key=lambda r: (r[1], r[0]))
    n = len(pl)
    base, extra = n // 10, n % 10
    chi2, gb, idx = 0.0, 0, 0
    for g in range(10):
        sz = base + (1 if g < extra else 0)
        b = pl[idx:idx + sz]
        idx += sz
        if not b:
            continue
        gb += 1
        ng = len(b)
        og = sum(r[2] for r in b)
        eg = sum(r[1] for r in b)
        pbar = eg / ng
        chi2 += (og - eg) ** 2 / max(ng * pbar * (1 - pbar), 1e-9)
    df = max(gb - 2, 1)
    crit = df * (1 - 2 / (9 * df) + 1.6449 * math.sqrt(2 / (9 * df))) ** 3
    verdict = "miscalibrated" if chi2 > crit else "calibrated"
    return (n, gb, df, _r(chi2), _r(crit), verdict)


_WORDS = ("the quick brown fox alpha beta gamma delta epsilon zeta eta"
          " theta iota kappa lambda sigma omega data spark token").split()


def _mixed_rows(n):
    rows = []
    for i in range(n):
        t = " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(3 + i % 6))
        rows.append((t, "en" if i % 3 != 0 else "fr"))
    return rows


def test_hl_matches_reference(spark, tmp_path):
    rows = _mixed_rows(41)
    _write_docs(spark, tmp_path, rows)
    got = q_hosmer_lemeshow(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _hl_ref(rows)
    assert got[0]["n_bins"] == 10 and got[0]["df"] == 8


def test_hl_fewer_docs_than_bins(spark, tmp_path):
    rows = _mixed_rows(7)
    _write_docs(spark, tmp_path, rows)
    r = q_hosmer_lemeshow(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _hl_ref(rows)
    assert r["n_bins"] == 7 and r["df"] == 5


# --------------------------------------------------------- spiegelhalter z


def _sz_ref(rows):
    ps = [_prob_label(t, l) for t, l in rows]
    n = len(ps)
    brier = sum((o - p) ** 2 for p, o in ps) / n
    eb = sum(p * (1 - p) for p, o in ps) / n
    num = sum((o - p) * (1 - 2 * p) for p, o in ps)
    den = sum((1 - 2 * p) ** 2 * p * (1 - p) for p, o in ps)
    z = num / math.sqrt(den) if den > 0 else None
    verdict = ("miscalibrated" if z is not None and abs(z) > 1.96
               else "calibrated")
    return (n, _r(brier), _r(eb), _r(z) if z is not None else None, verdict)


def test_sz_matches_reference(spark, tmp_path):
    rows = _mixed_rows(35)
    _write_docs(spark, tmp_path, rows)
    got = q_spiegelhalter_z(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _sz_ref(rows)


def test_sz_label_flip_fires(spark, tmp_path):
    # same texts, labels flipped where the score is most confident:
    # every doc with prob >= 0.5 labeled NON-English -> o - p is large
    # negative where (1 - 2p) is negative -> strongly positive z? No:
    # direction aside, |z| must exceed 1.96 and brier > expected.
    rows = []
    for i, (t, _) in enumerate(_mixed_rows(30)):
        p, _o = _prob_label(t, "en")
        rows.append((t, "fr" if p >= 0.5 else "en"))
    _write_docs(spark, tmp_path, rows)
    r = q_spiegelhalter_z(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _sz_ref(rows)
    assert r["verdict"] == "miscalibrated"
    assert r["brier_score"] > r["expected_brier"]


# --------------------------------------------------------------- BWS drift


def _bws_ref(ncs):
    n_docs = len(ncs)
    c = math.floor(n_docs * 0.8)  # doc_ids are 1..n
    old = sorted(float(v) for i, v in enumerate(ncs, 1) if i < c)
    new = sorted(float(v) for i, v in enumerate(ncs, 1) if i >= c)
    allv = sorted(float(v) for v in ncs)

    def midrank(v):
        lo = sum(1 for x in allv if x < v)
        eq = sum(1 for x in allv if x == v)
        return lo + (eq + 1) / 2.0

    def half(x, y):
        n, m = len(x), len(y)
        big = n + m
        s = 0.0
        for i, v in enumerate(x, 1):
            rr = midrank(v)
            s += ((rr - (big / n) * i) ** 2
                  / ((i / (n + 1)) * (1 - i / (n + 1))
                     * (max(m, 1) * big / n)))
        return s / n

    bx, by = half(old, new), half(new, old)
    b = (bx + by) / 2
    verdict = ("distributions_differ" if b > 2.493
               else "distributions_consistent")
    return (len(old), len(new), _r(bx), _r(by), _r(b), verdict)


def test_bws_null_case_consistent(spark, tmp_path):
    # arrival drawn from the same arithmetic ramp: no drift signal
    ncs = [100 + (i * 37) % 500 for i in range(40)]
    _write_docs_nchars(spark, tmp_path, ncs)
    got = q_bws_length_drift(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _bws_ref(ncs)
    assert got[0]["verdict"] == "distributions_consistent"


def test_bws_tail_shift_fires(spark, tmp_path):
    # arrival batch 10x longer: strong tail separation
    ncs = [100 + (i * 13) % 200 for i in range(32)] \
        + [3000 + i * 11 for i in range(8)]
    _write_docs_nchars(spark, tmp_path, ncs)
    r = q_bws_length_drift(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _bws_ref(ncs)
    assert r["verdict"] == "distributions_differ"
    assert r["n_old"] == 31 and r["n_new"] == 9


def test_bws_heavy_ties_midranks(spark, tmp_path):
    ncs = [100] * 12 + [200] * 12 + [100] * 3 + [200] * 3
    _write_docs_nchars(spark, tmp_path, ncs)
    r = q_bws_length_drift(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _bws_ref(ncs)


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    _write_docs(spark, tmp_path, _mixed_rows(12))
    for fn in (q_hosmer_lemeshow, q_spiegelhalter_z):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    _write_docs_nchars(spark, tmp_path, list(range(100, 130)))
    plan = q_bws_length_drift(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan
