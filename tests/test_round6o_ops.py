"""Round-5 batch-68 operators on crafted inputs, verified against
independent Python computations: watson_u2_daytime (circular CvM
between weekday/weekend seconds-of-day), weighted_kappa_deciles
(linear+quadratic Cohen kappa over the length x punct-density decile
grid), icc_half_scores (two-way ANOVA ICC of the even/odd classifier
halves).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    q_icc_half_scores,
    q_watson_u2_daytime,
    q_weighted_kappa_deciles,
)

_EPOCH = dt.datetime(1970, 1, 1)  # epoch day 0 = Thursday


def _r4(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"),
                                     rounding=ROUND_HALF_UP))


def _write_events_secs(spark, path, rows):
    """rows: (epoch_seconds,) absolute."""
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), 1, "e", 1.0, "{}")
         for i, s in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------------- watson U2


def _watson_ref(secs):
    """secs: list of absolute epoch seconds."""
    pts = []
    for s in secs:
        day = s // 86400
        wknd = 1 if (day + 4) % 7 in (0, 6) else 0
        pts.append((s % 86400, wknd))
    supp = sorted({p for p, _ in pts})
    nd = float(sum(1 for _, w in pts if w == 0))
    ne = float(sum(1 for _, w in pts if w == 1))
    std = std2 = 0.0
    cwd = cwe = 0.0
    for v in supp:
        cd = sum(1 for p, w in pts if p == v and w == 0)
        ce = sum(1 for p, w in pts if p == v and w == 1)
        cwd += cd
        cwe += ce
        t = cd + ce
        d = cwd / nd - cwe / ne
        std += t * d
        std2 += t * d * d
    nn = nd + ne
    u2 = nd * ne / (nn * nn) * (std2 - std * std / nn)
    return (int(nd), int(ne), _r4(u2), 1 if u2 > 0.187 else 0)


def test_watson_matches_reference(spark, tmp_path):
    secs = []
    # weekdays (day 0 = Thursday): morning-heavy
    for d in (0, 1, 4, 5):
        secs += [d * 86400 + 9 * 3600 + i * 601 for i in range(20)]
    # weekend (days 2=Sat, 3=Sun): evening-heavy
    for d in (2, 3):
        secs += [d * 86400 + 20 * 3600 + i * 307 for i in range(20)]
    _write_events_secs(spark, tmp_path, secs)
    got = q_watson_u2_daytime(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _watson_ref(secs)
    assert got[0]["shifted_05"] == 1


def test_watson_same_rhythm_quiet(spark, tmp_path):
    secs = []
    for d in range(7):
        secs += [d * 86400 + 8 * 3600 + i * 907 for i in range(15)]
    _write_events_secs(spark, tmp_path, secs)
    r = q_watson_u2_daytime(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _watson_ref(secs)
    assert r["shifted_05"] == 0


# -------------------------------------------------------- weighted kappa


def _wk_ref(texts):
    n = len(texts)
    punct = [len(re.findall(r"[.!?,;:]", t)) for t in texts]
    pr = [punct[i] / max(len(texts[i]), 1) for i in range(n)]

    def deciles(vals):
        order = sorted(range(n), key=lambda i: (vals[i], i + 1))
        base, extra = divmod(n, 10)
        dec, pos = {}, 0
        for b in range(1, 11):
            size = base + (1 if b <= extra else 0)
            for _ in range(size):
                if pos < n:
                    dec[order[pos]] = b
                    pos += 1
        return dec

    dl = deciles([len(t) for t in texts])
    dp = deciles(pr)
    cells = {}
    for i in range(n):
        key = (dl[i], dp[i])
        cells[key] = cells.get(key, 0.0) + 1
    ri = {}
    cj = {}
    for (a, b), c in cells.items():
        ri[a] = ri.get(a, 0.0) + c
        cj[b] = cj.get(b, 0.0) + c
    o_lin = sum(c * abs(a - b) / 9.0 for (a, b), c in cells.items())
    o_quad = sum(c * (a - b) ** 2 / 81.0 for (a, b), c in cells.items())
    e_lin = sum(ri[a] * cj[b] / n * abs(a - b) / 9.0
                for a in ri for b in cj)
    e_quad = sum(ri[a] * cj[b] / n * (a - b) ** 2 / 81.0
                 for a in ri for b in cj)
    exact = sum(c for (a, b), c in cells.items() if a == b)
    w1 = sum(c for (a, b), c in cells.items() if abs(a - b) <= 1)
    kl = 1 - o_lin / e_lin
    kq = 1 - o_quad / e_quad
    verdict = ("slight" if kq < 0.2 else "fair" if kq < 0.4
               else "moderate" if kq < 0.6
               else "substantial" if kq < 0.8 else "almost_perfect")
    return (n, _r4(kl), _r4(kq), _r4(exact / n), _r4(w1 / n), verdict)


def test_wk_matches_reference(spark, tmp_path):
    # length and punct density positively coupled with jitter
    texts = []
    for i in range(40):
        words = 4 + i
        puncts = max(1, (i + 3) // 4 + (i % 3))
        body = ("word " * words).strip()
        texts.append(body + "." * puncts)
    _write_docs(spark, tmp_path, texts)
    got = q_weighted_kappa_deciles(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _wk_ref(texts)


def test_wk_inverse_coupling_negative(spark, tmp_path):
    # longer docs get FEWER puncts: strong ordinal disagreement
    texts = []
    for i in range(40):
        body = ("w " * (4 + 2 * i)).strip()
        texts.append(body + "." * (45 - i))
    _write_docs(spark, tmp_path, texts)
    r = q_weighted_kappa_deciles(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _wk_ref(texts)
    assert r["kappa_quadratic"] < 0
    assert r["verdict"] == "slight"


# ------------------------------------------------------------------- ICC


def _md5u(s, lo=0):
    return int(hashlib.md5(s.encode()).hexdigest()[lo:lo + 8], 16)


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _clf_sum(words):
    return sum(_md5u(f"w:{_md5u(w) % 4096}") % 2001 - 1000
               for w in words)


def _icc_ref(texts):
    se = [float(_clf_sum(_toks(t)[0::2])) for t in texts]
    so = [float(_clf_sum(_toks(t)[1::2])) for t in texts]
    n = float(len(texts))
    me, mo = sum(se) / n, sum(so) / n
    g = (sum(se) + sum(so)) / (2 * n)
    msr = 2 * sum(((a + b) / 2 - g) ** 2
                  for a, b in zip(se, so)) / (n - 1)
    msc = n * ((me - g) ** 2 + (mo - g) ** 2)
    d = [a - b for a, b in zip(se, so)]
    db = sum(d) / n
    mse = sum((x - db) ** 2 for x in d) / (2 * (n - 1))
    icc_c = (msr - mse) / (msr + mse)
    icc_a = (msr - mse) / (msr + mse + 2 * (msc - mse) / n)
    return (int(n), _r4(msr), _r4(msc), _r4(mse), _r4(me - mo),
            _r4(icc_c), _r4(icc_a))


def test_icc_matches_reference(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta iota"
             " kappa lam mu nu xi omicron pi").split()
    texts = []
    for i in range(24):
        w = words[i % len(words)]
        f = words[(i * 5 + 2) % len(words)]
        texts.append(((w + " ") * (5 + i % 6) + f + " " + w).strip())
    _write_docs(spark, tmp_path, texts)
    got = q_icc_half_scores(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _icc_ref(texts)


def test_icc_systematic_bias_splits_the_iccs(spark, tmp_path):
    # doc = w repeated 2k times + one trailing token c at an EVEN
    # position: se = k*clf(w) + clf(c), so = k*clf(w) -> perfectly
    # correlated halves (mse ~ 0, consistency = 1) with a CONSTANT
    # offset clf(c) that only absolute agreement charges
    words = ("alpha beta gamma delta epsilon zeta eta theta"
             " iota kappa").split()
    w = max(words, key=lambda x: abs(_clf_sum([x])))
    c = max((x for x in words if x != w),
            key=lambda x: abs(_clf_sum([x])))
    texts = [" ".join([w] * (2 * (3 + i))) + " " + c for i in range(15)]
    _write_docs(spark, tmp_path, texts)
    r = q_icc_half_scores(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _icc_ref(texts)
    assert abs(r["half_bias"]) > 0
    assert r["icc_consistency"] == 1.0
    assert r["icc_agreement"] < r["icc_consistency"]


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_events_secs(spark, tmp_path,
                       [d * 86400 + 3600 * (d % 5) + i * 700
                        for d in range(7) for i in range(6)])
    _write_docs(spark, tmp_path,
                [("word " * (3 + i)).strip() + "." * (1 + i % 4)
                 for i in range(12)])
    for fn, mx in ((q_watson_u2_daytime, 3),
                   (q_weighted_kappa_deciles, 1),
                   (q_icc_half_scores, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
