"""Round-5 batch-73 operators on crafted inputs, verified against
independent Python computations: yuen_trimmed_t (20%-trimmed robust
two-sample t with winsorized variance), wilcoxon_signed_rank_halves
(tie-corrected paired signed-rank on even/odd scores),
crude_odds_ratio_ci (2x2 OR/RR with Woolf/Katz CIs).  Plan pins at
the bottom."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _YUEN_TRIM,
    q_crude_odds_ratio_ci,
    q_wilcoxon_signed_rank_halves,
    q_yuen_trimmed_t,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _write_docs_nchars(spark, path, rows):
    spark.createDataFrame(
        [(i, "x" * n, "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_text(spark, path, rows):
    """rows: (text, source)"""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# -------------------------------------------------------------------- yuen


def _yuen_ref(a, b):
    def grp_stats(vals):
        n = len(vals)
        k = int(math.floor(n * _YUEN_TRIM))
        s = sorted(vals)
        mid = s[k:n - k]
        wins = [s[k]] * k + mid + [s[n - k - 1]] * k
        tmean = sum(mid) / len(mid)
        wm = sum(wins) / n
        s2w = sum((x - wm) ** 2 for x in wins) / (n - 1)
        h = n - 2 * k
        d = s2w * (n - 1) / (h * (h - 1))
        return n, tmean, d, h

    n1, m1, d1, h1 = grp_stats([float(x) for x in a])
    n2, m2, d2, h2 = grp_stats([float(x) for x in b])
    t = (m1 - m2) / math.sqrt(d1 + d2)
    df = (d1 + d2) ** 2 / (d1 * d1 / (h1 - 1) + d2 * d2 / (h2 - 1))
    verdict = ("trimmed_means_differ" if abs(t) > 1.96
               else "trimmed_means_consistent")
    return (n1, n2, _r(m1), _r(m2), _r(t), _r(df, 2), verdict)


def test_yuen_matches_reference(spark, tmp_path):
    a = [100, 120, 130, 140, 150, 155, 160, 170, 180, 5000]  # outlier
    b = [200, 210, 215, 220, 230, 240, 250, 9000]            # outlier
    rows = [("big", x) for x in a] + [("sml", x) for x in b] \
        + [("tiny", 7)]
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_yuen_trimmed_t(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _yuen_ref(a, b)
    # trimming must neutralize the outliers: trimmed means reflect
    # the central masses, and the gap is detected
    assert got[0]["trimmed_mean_a"] < 200
    assert got[0]["verdict"] == "trimmed_means_differ"


def test_yuen_ties_heavy(spark, tmp_path):
    a = [100] * 6 + [150] * 6 + [200] * 3
    b = [100] * 3 + [150] * 5 + [200] * 6
    rows = [("big", x) for x in a] + [("sml", x) for x in b]
    _write_docs_nchars(spark, tmp_path, rows)
    r = q_yuen_trimmed_t(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _yuen_ref(a, b)


# --------------------------------------------------------- signed rank


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _clf_sum(words):
    return sum(_md5u(f"w:{_md5u(w) % 4096}") % 2001 - 1000
               for w in words)


def _wsr_ref(texts):
    ds = []
    for t in texts:
        ws = _toks(t)
        d = float(_clf_sum(ws[0::2]) - _clf_sum(ws[1::2]))
        if d != 0:
            ds.append(d)
    ads = [abs(d) for d in ds]
    cnt = Counter(ads)
    ranks = {}
    cum = 0
    for v in sorted(cnt):
        ranks[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    npz = float(len(ds))
    wplus = sum(ranks[abs(d)] for d in ds if d > 0)
    npos = sum(1 for d in ds if d > 0)
    nneg = sum(1 for d in ds if d < 0)
    tcorr = sum(t ** 3 - t for t in cnt.values() if t > 1)
    mu = npz * (npz + 1) / 4.0
    sd = math.sqrt(npz * (npz + 1) * (2 * npz + 1) / 24.0 - tcorr / 48.0)
    cc = 0.5 if wplus > mu else (-0.5 if wplus < mu else 0.0)
    z = (wplus - mu - cc) / sd
    verdict = ("halves_systematically_differ" if abs(z) > 1.96
               else "halves_exchangeable")
    return (int(npz), npos, nneg, round(wplus, 1), _r(z), verdict)


def test_wsr_matches_reference(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta iota"
             " kappa lam mu nu xi").split()
    texts = []
    for i in range(26):
        t = " ".join(words[(i * 3 + j) % len(words)]
                     for j in range(3 + i % 6))
        texts.append(t)
    _write_docs_text(spark, tmp_path, [(t, "s") for t in texts])
    got = q_wilcoxon_signed_rank_halves(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _wsr_ref(texts)


def test_wsr_systematic_offset_detected(spark, tmp_path):
    # even positions always word A, odd always word B -> every doc's
    # difference has the same sign
    words = ("alpha beta gamma delta epsilon zeta eta theta"
             " iota kappa").split()
    a = max(words, key=lambda w: _clf_sum([w]))
    b = min(words, key=lambda w: _clf_sum([w]))
    texts = [" ".join([a, b] * (2 + i % 5)) for i in range(18)]
    _write_docs_text(spark, tmp_path, [(t, "s") for t in texts])
    r = q_wilcoxon_signed_rank_halves(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _wsr_ref(texts)
    assert r["verdict"] == "halves_systematically_differ"
    assert r["n_odd_higher"] == 0 or r["n_even_higher"] == 0


# -------------------------------------------------------------- crude OR


def _or_ref(rows):
    tok_cnt = Counter(s for _, s in rows)
    top2 = sorted(tok_cnt, key=lambda s: (-tok_cnt[s], s))[:2]
    sa, sb = top2
    a = b = c = d = 0.0
    for t, s in rows:
        ok = _clf_sum(_toks(t)) >= 0
        if s == sa:
            a, b = (a + 1, b) if ok else (a, b + 1)
        elif s == sb:
            c, d = (c + 1, d) if ok else (c, d + 1)
    h = 0.5 if 0 in (a, b, c, d) else 0.0
    lor = math.log((a + h) * (d + h) / ((b + h) * (c + h)))
    se_lor = math.sqrt(1 / (a + h) + 1 / (b + h)
                       + 1 / (c + h) + 1 / (d + h))
    if a > 0 and c > 0:
        lrr = math.log((a / (a + b)) / (c / (c + d)))
        se_lrr = math.sqrt((1 - a / (a + b)) / (a + h)
                           + (1 - c / (c + d)) / (c + h))
        rr = (_r(math.exp(lrr)), _r(math.exp(lrr - 1.96 * se_lrr)),
              _r(math.exp(lrr + 1.96 * se_lrr)))
    else:
        rr = (None, None, None)
    lo, hi = math.exp(lor - 1.96 * se_lor), math.exp(lor + 1.96 * se_lor)
    verdict = ("gate_source_dependent" if lo > 1 or hi < 1
               else "gate_source_neutral")
    return (int(a), int(b), int(c), int(d),
            _r(math.exp(lor)), _r(lo), _r(hi)) + rr + (verdict,)


def test_or_matches_reference(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta"
             " iota kappa").split()
    goods = [w for w in words if _clf_sum([w]) >= 0]
    bads = [w for w in words if _clf_sum([w]) < 0]
    rows = []
    # source A: mostly passing docs; source B: mostly failing
    for i in range(14):
        rows.append((goods[i % len(goods)], "srcA"))
    for i in range(4):
        rows.append((bads[i % len(bads)], "srcA"))
    for i in range(5):
        rows.append((goods[i % len(goods)], "srcB"))
    for i in range(10):
        rows.append((bads[i % len(bads)], "srcB"))
    rows.append(("whatever text", "tiny"))
    _write_docs_text(spark, tmp_path, rows)
    got = q_crude_odds_ratio_ci(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _or_ref(rows)
    assert got[0]["odds_ratio"] > 1.0
    assert got[0]["verdict"] == "gate_source_dependent"


def test_or_zero_cell_haldane(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta"
             " iota kappa").split()
    goods = [w for w in words if _clf_sum([w]) >= 0]
    bads = [w for w in words if _clf_sum([w]) < 0]
    rows = ([(goods[i % len(goods)], "srcA") for i in range(8)]
            + [(bads[i % len(bads)], "srcB") for i in range(8)])
    _write_docs_text(spark, tmp_path, rows)
    r = q_crude_odds_ratio_ci(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _or_ref(rows)
    assert r["fail_a"] == 0 and r["pass_b"] == 0
    assert r["odds_ratio"] > 1.0          # finite thanks to +0.5


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    _write_docs_nchars(spark, tmp_path,
                       [("a", 100 + i * 7) for i in range(14)]
                       + [("b", 160 + i * 9) for i in range(11)])
    for fn in (q_yuen_trimmed_t,):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 1, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    _write_docs_text(spark, tmp_path,
                     [("alpha beta gamma", "a")] * 5
                     + [("delta epsilon", "b")] * 4)
    for fn in (q_wilcoxon_signed_rank_halves, q_crude_odds_ratio_ci):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= 2, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
