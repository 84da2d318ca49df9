"""Round-5 batch-60 operators on crafted inputs, verified against
independent Python computations: theil_u_association (directional
uncertainty coefficients source<->lang), goodman_kruskal_lambda
(proportional-reduction-in-error association), blb_mean_ci (Bag of
Little Bootstraps with md5 buckets and deterministic Poisson(1)
replicate weights).  Plan pins at the bottom."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pdf_extractor_spark.queries import (
    _BLB_R,
    _BLB_S,
    _POIS1_CUM,
    q_blb_mean_ci,
    q_goodman_kruskal_lambda,
    q_theil_u_association,
)


def _write_docs(spark, path, rows):
    """rows: (source, lang, n_chars)"""
    spark.createDataFrame(
        [(i, "x" * n, l, s, n) for i, (s, l, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ----------------------------------------------------------------- theil U


def _theil_ref(pairs):
    n = float(len(pairs))
    cs = Counter(s for s, _ in pairs)
    cl = Counter(l for _, l in pairs)
    cj = Counter(pairs)

    def h(counter):
        return -sum((c / n) * math.log(c / n) for c in counter.values())

    hs, hl, hsl = h(cs), h(cl), h(cj)
    mi = hs + hl - hsl
    return (int(n), round(hs, 4), round(hl, 4), round(mi, 4),
            round(mi / hl, 4) if hl else None,
            round(mi / hs, 4) if hs else None,
            round(2 * mi / (hs + hl), 4) if hs + hl else None)


def test_theil_u_matches_reference(spark, tmp_path):
    pairs = ([("web", "en")] * 6 + [("web", "de")] * 2
             + [("wiki", "de")] * 5 + [("wiki", "fr")] * 3
             + [("chat", "en")] * 4)
    _write_docs(spark, tmp_path, [(s, l, 100 + i)
                                  for i, (s, l) in enumerate(pairs)])
    got = q_theil_u_association(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _theil_ref(pairs)


def test_theil_u_asymmetry_direction(spark, tmp_path):
    # each source is language-PURE but each language spans sources:
    # knowing source pins lang exactly (U(L|S)=1); reverse is partial
    pairs = ([("s1", "en")] * 4 + [("s2", "en")] * 4
             + [("s3", "de")] * 4 + [("s4", "de")] * 4)
    _write_docs(spark, tmp_path, [(s, l, 100 + i)
                                  for i, (s, l) in enumerate(pairs)])
    r = q_theil_u_association(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _theil_ref(pairs)
    assert r["u_lang_given_source"] == 1.0
    assert r["u_source_given_lang"] < 1.0


# ------------------------------------------------------------------ lambda


def _lambda_ref(pairs):
    n = float(len(pairs))
    cj = Counter(pairs)
    cs = Counter(s for s, _ in pairs)
    cl = Counter(l for _, l in pairs)
    row_modal = sum(max(c for (s2, _), c in cj.items() if s2 == s)
                    for s in cs)
    col_modal = sum(max(c for (_, l2), c in cj.items() if l2 == l)
                    for l in cl)
    mr, mc = max(cs.values()), max(cl.values())
    lam_ls = (row_modal - mc) / (n - mc) if n != mc else None
    lam_sl = (col_modal - mr) / (n - mr) if n != mr else None
    lam_sym = ((row_modal + col_modal - mr - mc)
               / (2 * n - mr - mc)) if 2 * n != mr + mc else None
    return (int(n),
            round(lam_ls, 4) if lam_ls is not None else None,
            round(lam_sl, 4) if lam_sl is not None else None,
            round(lam_sym, 4) if lam_sym is not None else None,
            round(mc / n, 4), round(mr / n, 4))


def test_lambda_matches_reference(spark, tmp_path):
    pairs = ([("web", "en")] * 6 + [("web", "de")] * 2
             + [("wiki", "de")] * 5 + [("wiki", "fr")] * 3
             + [("chat", "en")] * 4)
    _write_docs(spark, tmp_path, [(s, l, 100 + i)
                                  for i, (s, l) in enumerate(pairs)])
    got = q_goodman_kruskal_lambda(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _lambda_ref(pairs)


def test_lambda_zero_when_modal_guess_never_changes(spark, tmp_path):
    # 'en' is modal within EVERY source -> lambda(L|S) = 0 even though
    # association (entropy-wise) exists
    pairs = ([("a", "en")] * 5 + [("a", "de")] * 1
             + [("b", "en")] * 5 + [("b", "fr")] * 3)
    _write_docs(spark, tmp_path, [(s, l, 100 + i)
                                  for i, (s, l) in enumerate(pairs)])
    r = q_goodman_kruskal_lambda(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _lambda_ref(pairs)
    assert r["lambda_lang_given_source"] == 0.0
    # and theil's U on the same table is strictly positive
    u = q_theil_u_association(spark, str(tmp_path)).collect()[0]
    assert u["mi_nats"] > 0


# --------------------------------------------------------------------- BLB


def _md5u(s, lo):
    return int(hashlib.md5(s.encode()).hexdigest()[lo:lo + 8], 16)


def _pois(u):
    for k, c in enumerate(_POIS1_CUM):
        if u < c:
            return k
    return 5


def _blb_ref(lengths):
    n = float(len(lengths))
    buckets = {}
    for doc_id, x in enumerate(lengths, 1):
        bkt = _md5u(f"{doc_id}:bkt", 0) % _BLB_S
        ws = [_pois(_md5u(f"{doc_id}:blb{b // 4}", 8 * (b % 4))
                    / 4294967296.0) for b in range(_BLB_R)]
        buckets.setdefault(bkt, []).append((float(x), ws))
    xis, bs = [], []
    for bkt, rows in buckets.items():
        bn = float(len(rows))
        ms = []
        for b in range(_BLB_R):
            sw = sum(w[b] for _, w in rows)
            swx = sum(x * w[b] for x, w in rows)
            if sw:
                ms.append(swx / sw)
        mm = sum(ms) / len(ms)
        se_b = math.sqrt(sum((m - mm) ** 2 for m in ms) / (len(ms) - 1))
        xis.append(se_b * math.sqrt(bn / n))
        bs.append(bn)
    blb_se = sum(xis) / len(xis)
    mean = sum(lengths) / n
    var = sum((x - mean) ** 2 for x in lengths) / (n - 1)
    se_an = math.sqrt(var / n)
    return {
        "n_docs": int(n),
        "b_avg": round(sum(bs) / len(bs), 1),
        "mean_chars": round(mean, 4),
        "blb_se": round(blb_se, 4),
        "ci_lo": round(mean - 1.96 * blb_se, 4),
        "ci_hi": round(mean + 1.96 * blb_se, 4),
        "se_analytic": round(se_an, 4),
        "se_ratio": round(blb_se / se_an, 4),
    }


def test_blb_matches_reference(spark, tmp_path):
    lengths = [100 + (i * 37) % 211 for i in range(160)]
    _write_docs(spark, tmp_path, [("s", "en", x) for x in lengths])
    got = q_blb_mean_ci(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    ref = _blb_ref(lengths)
    assert r["s_subsets"] == _BLB_S and r["r_replicates"] == _BLB_R
    for k, v in ref.items():
        assert r[k] == v, k
    # BLB should roughly agree with the analytic SE on iid data
    assert 0.5 < r["se_ratio"] < 2.0


def test_blb_zero_variance_degenerate(spark, tmp_path):
    lengths = [250] * 60
    _write_docs(spark, tmp_path, [("s", "en", x) for x in lengths])
    r = q_blb_mean_ci(spark, str(tmp_path)).collect()[0]
    assert r["mean_chars"] == 250.0
    assert r["blb_se"] == 0.0
    assert r["ci_lo"] == r["ci_hi"] == 250.0


# -------------------------------------------------------------- plan shapes


def test_plans_single_scan_no_cartesian(spark, tmp_path):
    pairs = [("a", "en"), ("a", "de"), ("b", "en"), ("b", "fr")] * 4
    _write_docs(spark, tmp_path, [(s, l, 100 + i)
                                  for i, (s, l) in enumerate(pairs)])
    for fn, mx in ((q_theil_u_association, 1),
                   (q_goodman_kruskal_lambda, 1),
                   (q_blb_mean_ci, 2)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
