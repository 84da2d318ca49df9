"""Round-5 batch-62 operators on crafted inputs, verified against
independent Python computations: runtime_filter_gain (exact semi-join
reduction + Bloom scan model on lineitem x urgent-orders),
bpref_eval (incomplete-judgment bpref vs AP on the BM25 pool),
propensity_overlap_audit (positivity / Kish-ESS audit between the two
largest sources).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import math
import re

from pdf_extractor_spark.queries import (
    _RTF_FPR,
    q_bpref_eval,
    q_propensity_overlap_audit,
    q_runtime_filter_gain,
)

_EPOCH = dt.datetime(1970, 1, 1)
_K1, _B = 1.2, 0.75
_TERMS = ("spark", "scan", "dup")


def _write_orders(spark, path, rows):
    """rows: (orderkey, priority)"""
    spark.createDataFrame(
        [(k, k % 7 + 1, "O", 100.0 + k, _EPOCH, pr) for k, pr in rows],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_lineitem(spark, path, orderkeys):
    spark.createDataFrame(
        [(ok, 1, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O",
          dt.datetime(1995, 6, 15))
         for i, ok in enumerate(orderkeys, 1)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _write_docs(spark, path, rows):
    """rows: (text, lang, source); n_chars = len(text)"""
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------ runtime_filter_gain


def test_runtime_filter_exact_counts(spark, tmp_path):
    orders = [(k, "1-URGENT" if k <= 3 else "5-LOW") for k in range(1, 11)]
    # lineitem: 12 rows, 5 of them on urgent orders 1-3
    lis = [1, 1, 2, 3, 3] + [4, 5, 6, 7, 8, 9, 10]
    _write_orders(spark, tmp_path, orders)
    _write_lineitem(spark, tmp_path, lis)
    r = q_runtime_filter_gain(spark, str(tmp_path)).collect()[0]
    assert r["orders_total"] == 10 and r["orders_selected"] == 3
    assert r["orders_selectivity"] == 0.3
    assert r["lineitem_total"] == 12 and r["lineitem_matching"] == 5
    assert r["semi_join_reduction"] == round(1 - 5 / 12, 4)
    est = 5 + _RTF_FPR * 7
    assert r["lineitem_scanned_bloom_est"] == round(est)
    assert r["probe_side_speedup_x"] == round(12 / est, 2)


def test_runtime_filter_no_urgent_degenerate(spark, tmp_path):
    _write_orders(spark, tmp_path, [(k, "5-LOW") for k in range(1, 6)])
    _write_lineitem(spark, tmp_path, [1, 2, 3, 4, 5, 5])
    r = q_runtime_filter_gain(spark, str(tmp_path)).collect()[0]
    assert r["orders_selected"] == 0
    assert r["lineitem_matching"] == 0
    assert r["semi_join_reduction"] == 1.0


# ---------------------------------------------------------------- bpref


def _tokens(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _bm25_order(texts):
    toks = {i + 1: _tokens(t) for i, t in enumerate(texts)}
    n_docs = len(texts)
    total = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in _TERMS}
    out = {}
    for d, v in toks.items():
        score, m = 0.0, 0
        for t in _TERMS:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += idf * (tf * (_K1 + 1)) / (
                tf + _K1 * (1 - _B + _B * len(v) * n_docs / total))
        if m:
            out[d] = round(score, 4)
    return sorted(out, key=lambda d: (-out[d], d))[:20]


def _bpref_ref(texts):
    ranked = _bm25_order(texts)
    toks = {i + 1: set(_tokens(t)) for i, t in enumerate(texts)}
    flags = [1 if len(toks[d] & set(_TERMS)) >= 2 else 0 for d in ranked]
    rr, nn = sum(flags), len(flags) - sum(flags)
    bsum = apsum = 0.0
    nonrel_above = rel_upto = 0
    for r, f in enumerate(flags, 1):
        if f:
            rel_upto += 1
            if min(rr, nn):
                bsum += 1.0 - min(nonrel_above, min(rr, nn)) / min(rr, nn)
            else:
                bsum += 1.0  # no judged nonrelevant -> no penalty
            apsum += rel_upto / r
        else:
            nonrel_above += 1
    return (len(flags), rr, nn,
            round(bsum / rr, 4) if rr else None,
            round(apsum / rr, 4) if rr else None,
            round(abs(bsum - apsum) / rr, 4) if rr else None)


def test_bpref_matches_reference(spark, tmp_path):
    texts = [
        "spark scan dup", "plain filler here", "spark words",
        "more filler", "dup here", "scan scan", "filler again",
        "nothing", "spark dup", "empty of terms",
    ]
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    r = q_bpref_eval(spark, str(tmp_path)).collect()
    assert len(r) == 1
    got = tuple(r[0])
    ref = _bpref_ref(texts)
    # the SQL uses nullif(min(R,N)) -> perfect-ranking NULL-safe path
    assert got[:3] == ref[:3]
    assert got[3] == ref[3]
    assert got[4] == ref[4]


def test_bpref_perfect_ranking_is_one(spark, tmp_path):
    # every >=2-term doc ranks above every 1-term doc: no judged
    # nonrel above any rel -> bpref = 1 and AP = 1
    texts = ["spark scan dup", "spark scan", "dup",
             "filler", "filler two", "filler three"]
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    r = q_bpref_eval(spark, str(tmp_path)).collect()[0]
    assert r["bpref"] == 1.0
    assert r["ap_at_20"] == 1.0
    assert r["bpref_ap_gap"] == 0.0


# ------------------------------------------------- propensity overlap audit


def _prop_ref(rows):
    """rows as written: (text, lang, source); replicate ntile + cells."""
    n = len(rows)
    counts = {}
    for _, _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    top2 = sorted(counts, key=lambda s: (-counts[s], s))[:2]
    sa, sb = top2
    sel = [(i + 1, len(t), l, s) for i, (t, l, s) in enumerate(rows)
           if s in (sa, sb)]
    m = len(sel)
    order = sorted(range(m), key=lambda j: (sel[j][1], sel[j][0]))
    base, extra = divmod(m, 10)
    dec = {}
    pos = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            if pos < m:
                dec[order[pos]] = b
                pos += 1
    cells = {}
    for j, (_, _, l, s) in enumerate(sel):
        key = (dec[j], l)
        a, b = cells.get(key, (0.0, 0.0))
        if s == sa:
            a += 1
        else:
            b += 1
        cells[key] = (a, b)
    ncells = len(cells)
    both = sum(1 for a, b in cells.values() if a > 0 and b > 0)
    props = [a / (a + b) for a, b in cells.values() if a + b > 0]
    ta = sum(a for a, _ in cells.values())
    tb = sum(b for _, b in cells.values())
    off = sum(a + b for a, b in cells.values()
              if not 0.05 <= a / (a + b) <= 0.95)
    a_on = sum(a for a, b in cells.values() if a > 0 and b > 0)
    ws = [(a, b / a) for a, b in cells.values() if a > 0 and b > 0]
    wsum = sum(a * w for a, w in ws)
    w2sum = sum(a * w * w for a, w in ws)
    ess = (round(wsum * wsum / w2sum / a_on, 4)
           if w2sum and a_on else None)
    return (ncells, round(both / ncells, 4),
            round(min(props), 4), round(max(props), 4),
            int(ta), int(tb), round(off / (ta + tb), 4), ess)


def test_propensity_matches_reference(spark, tmp_path):
    rows = []
    for i in range(30):
        rows.append(("x" * (50 + i * 9), "en" if i % 3 else "de", "big"))
    for i in range(18):
        rows.append(("y" * (60 + i * 14), "en", "sml"))
    rows.append(("z" * 500, "fr", "tiny"))        # 3rd source ignored
    _write_docs(spark, tmp_path, rows)
    got = q_propensity_overlap_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _prop_ref(rows)


def test_propensity_disjoint_supports(spark, tmp_path):
    # A only short docs, B only long docs -> zero overlap cells,
    # everything off-support
    rows = ([("a" * (10 + i), "en", "A") for i in range(12)]
            + [("b" * (500 + i), "en", "B") for i in range(10)])
    _write_docs(spark, tmp_path, rows)
    r = q_propensity_overlap_audit(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _prop_ref(rows)
    assert r["overlap_cell_share"] == 0.0
    assert r["off_support_share"] == 1.0


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_orders(spark, tmp_path,
                  [(k, "1-URGENT" if k % 2 else "5-LOW")
                   for k in range(1, 9)])
    _write_lineitem(spark, tmp_path, [1, 2, 3, 4, 5, 6, 7, 8])
    _write_docs(spark, tmp_path,
                [("spark scan dup filler", "en", "a"),
                 ("plain", "en", "a"), ("dup", "de", "b"),
                 ("scan", "en", "b")])
    for fn, mx in ((q_runtime_filter_gain, 3),
                   (q_bpref_eval, 6),
                   (q_propensity_overlap_audit, 2)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
