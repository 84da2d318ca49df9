"""Round-5 batch-31 operators on crafted inputs, verified against
independent Python computations: secret_token_scan (entropy credential
detector), quantile_regression_daily (exact pinball argmin vs brute
force), hll_intersection_error (inclusion-exclusion sketch audit vs a
from-scratch HLL and exact set algebra)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _HLL_M,
    _QR_TAUS,
    _SECRET_MIN_BITS,
    _SECRET_MIN_LEN,
    q_hll_intersection_error,
    q_quantile_regression_daily,
    q_secret_token_scan,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_docs(spark, path, rows):
    """rows: (source, text)."""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    """rows: (day, user_id, event_type)."""
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(days=d, seconds=i), u, t, 0.0, "{}")
         for i, (d, u, t) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_daily_counts(spark, path, counts):
    rows = []
    for d, c in enumerate(counts):
        rows.extend((d, 1, "view") for _ in range(c))
    _write_events(spark, path, rows)


# ----------------------------------------------------------- secret_token_scan


def _secret_expect(rows):
    per_src: dict[str, dict] = {}
    for s, t in rows:
        st = per_src.setdefault(
            s, {"n_docs": 0, "cand": 0, "sec": 0, "docs_sec": 0,
                "hsum": 0.0})
        st["n_docs"] += 1
        doc_sec = 0
        for tok in (w for w in re.split(r"\s+", t) if w):
            if (len(tok) >= _SECRET_MIN_LEN
                    and re.search(r"[A-Za-z]", tok)
                    and re.search(r"[0-9]", tok)):
                st["cand"] += 1
                n = len(tok)
                h = round(-sum((c / n) * math.log(c / n)
                               for c in Counter(tok).values())
                          / math.log(2), 4)
                if h >= _SECRET_MIN_BITS:
                    st["sec"] += 1
                    st["hsum"] += h
                    doc_sec += 1
        if doc_sec:
            st["docs_sec"] += 1
    return per_src


_KEY = "a1B2c3D4e5F6g7H8i9J0"          # 20 distinct chars -> ~4.32 bits
_DULL = "aaaaaaaaaa1111111111"          # 2 distinct chars -> 1.0 bit


def test_secret_scan_flags_only_high_entropy(spark, tmp_path):
    rows = [
        ("leaky", f"deploy with token {_KEY} now"),
        ("leaky", f"config value {_DULL} is padding"),  # candidate, no flag
        ("leaky", "just ordinary prose with short words"),
        ("clean", "nothing suspicious here at all"),
        ("clean", "abcdefghijklmnopqrstuvwxyz has no digits"),  # no digit
    ]
    _write_docs(spark, tmp_path, rows)
    want = _secret_expect(rows)
    got = {r["source"]: r
           for r in q_secret_token_scan(spark, str(tmp_path)).collect()}
    assert set(got) == {"leaky", "clean"}
    for s, w in want.items():
        r = got[s]
        assert r["n_docs"] == w["n_docs"]
        assert r["n_candidate_tokens"] == w["cand"]
        assert r["n_secret_tokens"] == w["sec"]
        assert r["docs_with_secrets"] == w["docs_sec"]
        assert r["secret_doc_rate"] == round(w["docs_sec"] / w["n_docs"], 4)
        if w["sec"]:
            assert r["mean_secret_entropy_bits"] == round(
                w["hsum"] / w["sec"], 4)
        else:
            assert r["mean_secret_entropy_bits"] is None
    assert got["leaky"]["n_candidate_tokens"] == 2
    assert got["leaky"]["n_secret_tokens"] == 1
    assert got["clean"]["n_candidate_tokens"] == 0


# ---------------------------------------------------- quantile_regression_daily


def _qreg_py(counts):
    y = list(counts)
    n = len(y)
    cands = sorted({(y[j] - y[i], j - i)
                    for i in range(n) for j in range(i + 1, n)})
    out = {}
    for tau10 in _QR_TAUS:
        best = None
        for p, q in cands:
            sr = sorted(q * y[i] - p * i for i in range(n))
            qb = next(v for rk, v in enumerate(sr, 1) if 10 * rk >= tau10 * n)
            intloss = sum(tau10 * (s - qb) if s - qb >= 0
                          else (tau10 - 10) * (s - qb)
                          for s in (q * y[i] - p * i for i in range(n)))
            key = (intloss / (10.0 * q), p / q, qb / q)
            if best is None or key < best:
                best = key
        out[tau10 / 10.0] = {
            "slope_per_day": round(best[1], 6),
            "intercept": round(best[2], 6),
            "pinball_loss": round(best[0], 4),
        }
    return out


def test_qreg_exact_line_zero_loss(spark, tmp_path):
    counts = [3 + 2 * i for i in range(8)]
    _write_daily_counts(spark, tmp_path, counts)
    rows = q_quantile_regression_daily(spark, str(tmp_path)).collect()
    assert [r["tau"] for r in rows] == [0.5, 0.9]
    for r in rows:
        assert r["n_days"] == 8
        assert r["slope_per_day"] == 2.0
        assert r["intercept"] == 3.0
        assert r["pinball_loss"] == 0.0


def test_qreg_matches_bruteforce_python(spark, tmp_path):
    counts = [3, 7, 2, 11, 6, 13, 5, 17, 9, 4, 15, 8]
    _write_daily_counts(spark, tmp_path, counts)
    want = _qreg_py(counts)
    rows = q_quantile_regression_daily(spark, str(tmp_path)).collect()
    got = {r["tau"]: r for r in rows}
    assert set(got) == set(want)
    for tau, w in want.items():
        r = got[tau]
        assert r["slope_per_day"] == w["slope_per_day"]
        assert r["intercept"] == w["intercept"]
        assert r["pinball_loss"] == w["pinball_loss"]
    # the p90 line should sit above the median line for this spiky series
    f = {t: got[t]["slope_per_day"] * 5 + got[t]["intercept"] for t in got}
    assert f[0.9] >= f[0.5]


# ----------------------------------------------------- hll_intersection_error


def _hll_est(users):
    regs: dict[int, int] = {}
    for u in users:
        h = _md5int(str(u))
        idx, rest = h % _HLL_M, h // _HLL_M
        rho = 25 if rest == 0 else 25 - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    c = len(regs)
    v = _HLL_M - c
    s = sum(2.0 ** -mr for mr in regs.values())
    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    raw = alpha * _HLL_M * _HLL_M / (s + v)
    if raw <= 2.5 * _HLL_M and v > 0:
        return _HLL_M * math.log(_HLL_M / v)
    return raw


def test_hll_intersection_vs_python(spark, tmp_path):
    sets = {
        "click": set(range(1, 31)),
        "view": set(range(20, 61)),     # overlaps click on 20..30
        "purchase": set(range(200, 206)),  # disjoint from both
    }
    rows = []
    for t, users in sets.items():
        rows.extend((0, u, t) for u in users)
        # duplicates must not matter to either side
        rows.extend((1, u, t) for u in list(users)[:3])
    _write_events(spark, tmp_path, rows)
    out = {(r["type_a"], r["type_b"]): r
           for r in q_hll_intersection_error(spark, str(tmp_path)).collect()}
    names = sorted(sets)
    want_pairs = {(a, b) for i, a in enumerate(names)
                  for b in names[i + 1:]}
    assert set(out) == want_pairs
    for (a, b), r in out.items():
        ea, eb = _hll_est(sets[a]), _hll_est(sets[b])
        eu = _hll_est(sets[a] | sets[b])
        exact = len(sets[a] & sets[b])
        assert r["exact_a"] == len(sets[a])
        assert r["exact_b"] == len(sets[b])
        assert r["exact_inter"] == exact
        assert r["est_inter"] == round(ea + eb - eu, 2)
        assert r["abs_err"] == round(ea + eb - eu - exact, 2)
        if exact:
            assert r["rel_err"] == round(abs(ea + eb - eu - exact) / exact, 4)
        else:
            assert r["rel_err"] is None
