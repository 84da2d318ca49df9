"""Round-5 batch-29 operators on crafted inputs, verified against
independent Python computations: isotonic_calibration (minimax fit vs a
from-scratch weighted PAVA), huber_location (unrolled IRLS vs a
sequential Python implementation incl. the MAD=0 guard),
median_polish_grid (two-sweep Tukey polish vs a Python polish, plus the
exact decomposition identity)."""

from __future__ import annotations

import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    _HUBER_ITERS,
    _HUBER_K,
    q_huber_location,
    q_isotonic_calibration,
    q_median_polish_grid,
)


def _write_docs(spark, path, rows):
    """rows: (text, lang, source) tuples; n_chars = len(text)."""
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_nchars(spark, path, rows):
    """rows: (source, lang, n_chars) with synthetic text."""
    spark.createDataFrame(
        [(i, "x", l, s, n) for i, (s, l, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _low_median(vals):
    vs = sorted(vals)
    return vs[(len(vs) - 1) // 2]


# ------------------------------------------------------- isotonic_calibration


def _clf_buckets(texts):
    """(bucket -> [n, ok]) under the op's exact signal definitions."""
    out: dict[int, list[int]] = {}
    for t in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000 for w in toks)
        prob = round(
            1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(toks), 1)))), 4)
        b = min(int(prob * 10), 9)
        punct = len(re.findall(r"[.!?,;:]", t))
        ok = (200 <= len(t) <= 50000
              and 0.005 <= punct / max(len(t), 1) <= 0.2)
        cell = out.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += int(ok)
    return out


def _pava(buckets):
    """Weighted pool-adjacent-violators over ordered buckets -> fitted."""
    order = sorted(buckets)
    blocks = [[b, buckets[b][0], buckets[b][1]] for b in order]  # key, n, ok
    pooled: list[list] = []
    for blk in blocks:
        pooled.append([[blk[0]], blk[1], blk[2]])
        while (len(pooled) >= 2
               and pooled[-2][2] * pooled[-1][1]
               >= pooled[-1][2] * pooled[-2][1]):  # prev rate >= next rate
            keys, n1, o1 = pooled.pop()
            pooled[-1][0].extend(keys)
            pooled[-1][1] += n1
            pooled[-1][2] += o1
    fitted = {}
    for keys, n, ok in pooled:
        for k in keys:
            fitted[k] = ok / n
    return fitted


def _iso_texts():
    # deterministic vocabulary spread over many words -> several prob deciles
    texts = []
    for i in range(40):
        words = [f"tok{i}x{j}" for j in range(6 + i % 5)]
        body = " ".join(words)
        texts.append((body + ". " + body.upper() + ",") * 12)
    return texts


def test_isotonic_matches_from_scratch_pava(spark, tmp_path):
    texts = _iso_texts()
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    buckets = _clf_buckets(texts)
    assert len(buckets) >= 3  # the fixture spans several deciles
    fitted = _pava(buckets)
    rows = q_isotonic_calibration(spark, str(tmp_path)).collect()
    assert [r["prob_bucket"] for r in rows] == sorted(buckets)
    for r in rows:
        n, ok = buckets[r["prob_bucket"]]
        assert r["n_docs"] == n
        assert r["ok_rate"] == round(ok / n, 4)
        assert r["iso_ok_rate"] == round(fitted[r["prob_bucket"]], 4)
        assert r["pooled"] == int(
            round(ok / n, 4) != round(fitted[r["prob_bucket"]], 4))


def test_isotonic_is_monotone_and_mass_preserving(spark, tmp_path):
    texts = _iso_texts()
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    rows = q_isotonic_calibration(spark, str(tmp_path)).collect()
    iso = [r["iso_ok_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone by construction
    # PAVA preserves total ok mass: sum(n * fitted) == sum(ok)
    total_fit = sum(r["n_docs"] * r["iso_ok_rate"] for r in rows)
    total_ok = sum(r["n_docs"] * r["ok_rate"] for r in rows)
    assert abs(total_fit - total_ok) < 1e-6 * max(total_ok, 1)


# ------------------------------------------------------------- huber_location


def _huber_py(vals):
    med = _low_median(vals)
    mad = _low_median([abs(v - med) for v in vals])
    scale = round(1.4826 * mad, 4)
    mu = float(med)
    if scale > 0:
        for _ in range(_HUBER_ITERS):
            ws = [1.0 if abs(v - mu) <= _HUBER_K * scale
                  else _HUBER_K * scale / abs(v - mu) for v in vals]
            mu = round(sum(w * v for w, v in zip(ws, vals))
                       / sum(ws), 4)
    return med, scale, mu


def test_huber_mad_zero_stays_at_median(spark, tmp_path):
    vals = [100] * 9 + [10000]
    _write_docs_nchars(spark, tmp_path, [("a", "en", v) for v in vals])
    r = q_huber_location(spark, str(tmp_path)).collect()[0]
    assert r["median_chars"] == 100.0
    assert r["mad_scale"] == 0.0
    assert r["huber_mu"] == 100.0  # scale-0 guard: no IRLS step applies
    assert r["mean_minus_huber"] == round(sum(vals) / len(vals) - 100.0, 4)


def test_huber_matches_sequential_irls(spark, tmp_path):
    grp = {
        "a": [100, 110, 120, 130, 140, 9000],     # one dragging outlier
        "b": [50, 60, 70, 80, 90, 100, 4000, 5000],
        "c": [200, 210, 220, 230],                # clean symmetric-ish
    }
    rows_in = [(s, "en", v) for s, vs in grp.items() for v in vs]
    _write_docs_nchars(spark, tmp_path, rows_in)
    got = {r["source"]: r
           for r in q_huber_location(spark, str(tmp_path)).collect()}
    assert set(got) == set(grp)
    for s, vs in grp.items():
        med, scale, mu = _huber_py(vs)
        r = got[s]
        assert r["n_docs"] == len(vs)
        assert r["median_chars"] == float(med)
        assert r["mad_scale"] == scale
        assert r["huber_mu"] == mu
        assert r["mean_chars"] == round(sum(vs) / len(vs), 4)
        # the estimator is actually robust: closer to the bulk than the mean
        if s in ("a", "b"):
            assert abs(r["huber_mu"] - med) < abs(r["mean_chars"] - med)


# --------------------------------------------------------- median_polish_grid


def _polish_py(grid):
    """Two-sweep low-median polish; grid: {(s,l): v} -> re, ce, resid."""
    sources = sorted({s for s, _ in grid})
    langs = sorted({l for _, l in grid})
    v = dict(grid)
    re_ = {s: 0 for s in sources}
    ce = {l: 0 for l in langs}
    for _ in range(2):
        for s in sources:
            cells = [v[(s, l)] for l in langs if (s, l) in v]
            r = _low_median(cells)
            for l in langs:
                if (s, l) in v:
                    v[(s, l)] -= r
            re_[s] += r
        for l in langs:
            cells = [v[(s, l)] for s in sources if (s, l) in v]
            c = _low_median(cells)
            for s in sources:
                if (s, l) in v:
                    v[(s, l)] -= c
            ce[l] += c
    return re_, ce, v


def test_polish_additive_grid_zero_residuals(spark, tmp_path):
    a = {"sa": 100, "sb": 400, "sc": 900}
    b = {"en": 0, "de": 50, "fr": 300}
    rows = [(s, l, a[s] + b[l]) for s in a for l in b]
    _write_docs_nchars(spark, tmp_path, rows)
    out = q_median_polish_grid(spark, str(tmp_path)).collect()
    assert len(out) == 9
    for r in out:
        assert r["residual"] == 0
        assert r["cell_median"] == a[r["source"]] + b[r["lang"]]
        assert (r["cell_median"]
                == r["row_effect"] + r["col_effect"] + r["residual"])


def test_polish_matches_python_and_flags_anomaly(spark, tmp_path):
    base = {("sa", "en"): 100, ("sa", "de"): 150, ("sa", "fr"): 120,
            ("sb", "en"): 300, ("sb", "de"): 350, ("sb", "fr"): 320,
            ("sc", "en"): 500, ("sc", "de"): 550,
            ("sc", "fr"): 2000}  # planted cell anomaly
    # two docs per cell so the cell low-median is exercised
    rows = []
    for (s, l), v in base.items():
        rows.extend([(s, l, v), (s, l, v + 7)])  # low median picks v
    _write_docs_nchars(spark, tmp_path, rows)
    re_, ce, resid = _polish_py(base)
    out = q_median_polish_grid(spark, str(tmp_path)).collect()
    got = {(r["source"], r["lang"]): r for r in out}
    assert set(got) == set(base)
    for key, v in base.items():
        r = got[key]
        assert r["cell_median"] == v
        assert r["row_effect"] == re_[key[0]]
        assert r["col_effect"] == ce[key[1]]
        assert r["residual"] == resid[key]
    # the anomaly owns (almost all of) the residual mass
    others = [abs(r["residual"]) for k, r in got.items()
              if k != ("sc", "fr")]
    assert abs(got[("sc", "fr")]["residual"]) > 10 * max(max(others), 1)
