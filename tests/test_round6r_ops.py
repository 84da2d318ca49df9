"""Round-5 batch-71 operators on crafted inputs, verified against
independent Python computations: soft_dedup_weights (1/m duplicate
reweighting mass accounting), adaptive_ece_audit (equal-width vs
equal-mass ECE), variance_break_levene (Brown-Forsythe volatility
break between daily halves).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    q_adaptive_ece_audit,
    q_soft_dedup_weights,
    q_variance_break_levene,
)

_EPOCH = dt.datetime(1970, 1, 1)


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


def _write_events_daily(spark, path, counts):
    out, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            out.append((eid, _EPOCH + dt.timedelta(days=d, seconds=eid),
                        1, "e", 1.0, "{}"))
    spark.createDataFrame(
        out,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


# -------------------------------------------------------------- soft dedup


def _soft_ref(texts):
    groups = Counter(texts)
    n = float(len(texts))
    tok = {t: float(len(_toks(t))) for t in groups}
    total = sum(tok[t] * m for t, m in groups.items())
    eff = sum(tok[t] * m / m for t, m in groups.items())
    dup_before = sum(tok[t] * m for t, m in groups.items() if m >= 2)
    dup_after = sum(tok[t] for t, m in groups.items() if m >= 2)
    d24 = sum(m for m in groups.values() if 2 <= m <= 4)
    d5 = sum(m for m in groups.values() if m >= 5)
    return (int(n), len(groups), int(total), round(eff, 1),
            _r(eff / total), _r(dup_before / total),
            _r(dup_after / eff), _r(d24 / n), _r(d5 / n))


def test_soft_dedup_matches_reference(spark, tmp_path):
    texts = (["common boilerplate text here"] * 6      # 5+ group
             + ["shared pair of docs"] * 2             # 2-4 group
             + ["another trio of copies"] * 3
             + ["unique one", "unique two words", "unique three"])
    _write_docs(spark, tmp_path, [(t, "en") for t in texts])
    got = q_soft_dedup_weights(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _soft_ref(texts)
    r = got[0]
    # soft weighting restores duplicated mass to its distinct share
    assert r["dup_mass_after"] < r["dup_mass_before"]


def test_soft_dedup_all_unique_identity(spark, tmp_path):
    texts = [f"totally unique document number {i} body" for i in range(9)]
    _write_docs(spark, tmp_path, [(t, "en") for t in texts])
    r = q_soft_dedup_weights(spark, str(tmp_path)).collect()[0]
    assert r["soft_keep_ratio"] == 1.0
    assert r["dup_mass_before"] == 0.0
    assert r["docs_in_2_4_groups"] == 0.0


# ------------------------------------------------------------ adaptive ECE


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _prob(text):
    ws = _toks(text)
    score = sum(_md5u(f"w:{_md5u(w) % 4096}") % 2001 - 1000 for w in ws)
    return _r(1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(ws), 1)))))


def _aece_ref(rows):
    pts = [(_prob(t), 1.0 if l == "en" else 0.0, i + 1)
           for i, (t, l) in enumerate(rows)]
    n = len(pts)

    def ece(binner):
        bins = {}
        for p, o, d in pts:
            bins.setdefault(binner(p, d), []).append((p, o))
        tot = 0.0
        mx = 0.0
        for b in bins.values():
            nb = float(len(b))
            gap = abs(sum(o for _, o in b) / nb
                      - sum(p for p, _ in b) / nb)
            tot += nb * gap
            mx = max(mx, gap)
        return tot / n, mx

    e_fix, m_fix = ece(lambda p, d: min(int(p * 10), 9))
    order = sorted(pts, key=lambda r: (r[0], r[2]))
    base, extra = divmod(n, 10)
    tile = {}
    pos = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            if pos < n:
                tile[order[pos][2]] = b
                pos += 1
    e_ad, m_ad = ece(lambda p, d: tile[d])
    ratio = e_ad / e_fix if e_fix else None
    verdict = ("binning_sensitive"
               if ratio is not None and (ratio > 1.5 or ratio < 0.667)
               else "binning_robust")
    return (n, _r(e_fix), _r(e_ad), _r(m_fix), _r(m_ad),
            _r(ratio) if ratio else None, verdict)


def test_aece_matches_reference(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta iota"
             " kappa lam mu nu xi omicron pi rho sigma").split()
    rows = []
    for i in range(40):
        t = " ".join(words[(i * 3 + j) % len(words)]
                     for j in range(2 + i % 6))
        rows.append((t, "en" if (i * 7) % 3 else "de"))
    _write_docs(spark, tmp_path, rows)
    got = q_adaptive_ece_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _aece_ref(rows)


# -------------------------------------------------------- variance break


def _vbl_ref(counts):
    n = len(counts)
    days = list(range(n))
    rk = {d: i + 1 for i, d in enumerate(days)}
    dmid = min(d for d in days if rk[d] * 2 >= n)
    halves = {0: [], 1: []}
    for d, c in enumerate(counts):
        halves[0 if d <= dmid else 1].append(float(c))

    def med(v):
        s = sorted(v)
        m = len(s)
        lo = s[int(math.floor((m + 1) / 2.0)) - 1]
        hi = s[int(math.ceil((m + 1) / 2.0)) - 1]
        return (lo + hi) / 2.0

    zs = {h: [abs(c - med(v)) for c in v] for h, v in halves.items()}
    per = [(float(len(z)), sum(z) / len(z),
            sum(x * x for x in z)) for z in zs.values()]
    ntot = sum(nj for nj, _, _ in per)
    gm = sum(nj * mz for nj, mz, _ in per) / ntot
    between = sum(nj * (mz - gm) ** 2 for nj, mz, _ in per)
    within = sum(szz - nj * mz * mz for nj, mz, szz in per)
    f = between / (within / (ntot - 2))
    verdict = ("volatility_regime_change" if f > 3.8415
               else "volatility_stable")
    return (int(ntot), _r(f), verdict)


def test_vbl_matches_reference_regime_change(spark, tmp_path):
    # flat mean, spread quadruples in the second half
    counts = ([50 + ((i * 7) % 5) - 2 for i in range(20)]
              + [50 + ((i * 11) % 41) - 20 for i in range(20)])
    _write_events_daily(spark, tmp_path, counts)
    got = q_variance_break_levene(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _vbl_ref(counts)
    assert got[0]["verdict"] == "volatility_regime_change"


def test_vbl_stable_series_quiet(spark, tmp_path):
    counts = [40 + ((i * 13) % 7) - 3 for i in range(30)]
    _write_events_daily(spark, tmp_path, counts)
    r = q_variance_break_levene(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _vbl_ref(counts)
    assert r["verdict"] == "volatility_stable"


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [("alpha beta", "en")] * 3 + [("gamma", "de")] * 4)
    _write_events_daily(spark, tmp_path,
                        [15 + (i * 3) % 8 for i in range(16)])
    for fn, mx in ((q_soft_dedup_weights, 1),
                   (q_adaptive_ece_audit, 1),
                   (q_variance_break_levene, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
