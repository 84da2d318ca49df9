"""Round-5 batch-31 operators on crafted inputs, verified against
independent Python computations: zorder_pruning_audit (full mirror of
rank-normalize -> bit-interleave -> 128-row zone maps -> band-predicate
skip rates), quantile_shift_profile (type-1 quantiles of two shifted
sources; third source ignored), seasonal_strength_score (Hyndman
strengths on a crafted weekend-spike series; constant series degrades
to NULL, not divide-by-zero)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pdf_extractor_spark.queries import (
    _Z_BITS,
    _Z_BLOCK_ROWS,
    q_quantile_shift_profile,
    q_seasonal_strength_score,
    q_zorder_pruning_audit,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_documents(spark, path, rows):
    # rows: (doc_id, n_chars, source)
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_chars", "source"])
    pdf["text"] = pdf["n_chars"].map(lambda n: "a" * min(int(n), 64))
    pdf["lang"] = "en"
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=i),
                         1, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ---------------------------------------------------------- zorder_pruning_audit


def _zorder_mirror(docs):
    """docs: list of (doc_id, n_chars) — mirror the whole audit."""
    n = len(docs)
    by_len = sorted(docs, key=lambda d: (d[1], d[0]))
    by_id = sorted(docs)
    rank_len = {d[0]: i for i, d in enumerate(by_len)}
    rank_id = {d[0]: i for i, d in enumerate(by_id)}
    cap = (1 << _Z_BITS) - 1

    def bucket(rank):  # percent_rank = rank / (n-1)
        return min(cap, int(rank / (n - 1) * (1 << _Z_BITS)))

    def zval(d):
        bl, bd = bucket(rank_len[d[0]]), bucket(rank_id[d[0]])
        z = 0
        for i in range(_Z_BITS):
            z += ((bl >> i) & 1) << (2 * i + 1)
            z += ((bd >> i) & 1) << (2 * i)
        return z

    lens = [float(d[1]) for d in docs]
    ids = [float(d[0]) for d in docs]
    len_lo = min(lens) + 0.25 * (max(lens) - min(lens))
    len_hi = min(lens) + 0.35 * (max(lens) - min(lens))
    id_lo = min(ids) + 0.25 * (max(ids) - min(ids))
    id_hi = min(ids) + 0.35 * (max(ids) - min(ids))
    layouts = {
        "by_length": by_len,
        "by_doc_id": by_id,
        "zorder": sorted(docs, key=lambda d: (zval(d), d[0])),
    }
    out = {}
    for name, order in layouts.items():
        nb = skip_len = skip_id = 0
        for s in range(0, n, _Z_BLOCK_ROWS):
            blk = order[s:s + _Z_BLOCK_ROWS]
            nb += 1
            bl = [float(d[1]) for d in blk]
            bi = [float(d[0]) for d in blk]
            if max(bl) < len_lo or min(bl) > len_hi:
                skip_len += 1
            if max(bi) < id_lo or min(bi) > id_hi:
                skip_id += 1
        out[name] = (nb, round(skip_len / nb, 4), round(skip_id / nb, 4),
                     round(min(skip_len / nb, skip_id / nb), 4),
                     round((skip_len / nb + skip_id / nb) / 2, 4))
    return out


def test_zorder_audit_matches_mirror_and_dominates(spark, tmp_path):
    # 1024 docs; lengths are a fixed modular shuffle of doc order so the
    # two dims are genuinely independent (a correlated pair would let a
    # single sort win both bands and hide the z-order effect)
    docs = [(i + 1, 100 + ((i * 389) % 1024)) for i in range(1024)]
    _write_documents(spark, tmp_path, [(d, ln, "s") for d, ln in docs])
    out = {r["layout"]: r
           for r in q_zorder_pruning_audit(spark, str(tmp_path)).collect()}
    mirror = _zorder_mirror(docs)
    assert sorted(out) == sorted(mirror)
    for name, (nb, sl, si, worst, mean) in mirror.items():
        r = out[name]
        assert r["n_blocks"] == nb
        assert r["len_band_skip_rate"] == sl
        assert r["id_band_skip_rate"] == si
        assert r["worst_dim_skip_rate"] == worst
        assert r["mean_skip_rate"] == mean
    # single-column sorts prune their own dim near-perfectly, the other
    # not at all; z-order must beat both on the worst dim
    assert out["by_length"]["len_band_skip_rate"] >= 0.85
    assert out["by_length"]["id_band_skip_rate"] == 0.0
    assert out["by_doc_id"]["id_band_skip_rate"] >= 0.85
    assert out["by_doc_id"]["len_band_skip_rate"] == 0.0
    assert (out["zorder"]["worst_dim_skip_rate"]
            > max(out["by_length"]["worst_dim_skip_rate"],
                  out["by_doc_id"]["worst_dim_skip_rate"]))
    assert out["zorder"]["worst_dim_skip_rate"] >= 0.4


# -------------------------------------------------------- quantile_shift_profile


def test_quantile_shift_two_shifted_sources(spark, tmp_path):
    # a: 10..99 by 1; b: same + 500 (pure location shift); z ignored
    rows = ([(i, 10 + i, "a") for i in range(90)]
            + [(100 + i, 510 + i, "b") for i in range(90)]
            + [(999, 77777, "z")])
    _write_documents(spark, tmp_path, rows)
    out = q_quantile_shift_profile(spark, str(tmp_path)).collect()
    assert len(out) == 9
    vals_a = sorted(10 + i for i in range(90))
    vals_b = sorted(510 + i for i in range(90))
    for r in out:
        p = r["quantile"]
        # type-1 quantile: smallest x whose cume_dist >= p
        idx = -(-int(p * 10) * 90 // 10)  # ceil(p * n) with exact tenths
        qa, qb = float(vals_a[idx - 1]), float(vals_b[idx - 1])
        assert (r["source_a"], r["source_b"]) == ("a", "b")
        assert r["q_a"] == qa and r["q_b"] == qb
        assert r["quantile_gap"] == round(qa - qb, 4)
        assert r["relative_gap"] == round((qa - qb) / ((qa + qb) / 2), 4)
        # pure location shift: the gap is exactly -500 at every decile
        assert r["quantile_gap"] == -500.0


# ------------------------------------------------------- seasonal_strength_score


def _strength_mirror(counts):
    xs = [float(c) for c in counts]
    n = len(xs)
    trend = [sum(xs[max(0, t - 3):min(n, t + 4)])
             / len(xs[max(0, t - 3):min(n, t + 4)]) for t in range(n)]
    detr = [x - tr for x, tr in zip(xs, trend)]
    dows = [(d + 4) % 7 for d in range(n)]
    eff = {w: sum(v for v, ww in zip(detr, dows) if ww == w)
           / sum(1 for ww in dows if ww == w) for w in set(dows)}
    resid = [v - eff[w] for v, w in zip(detr, dows)]
    deseason = [x - eff[w] for x, w in zip(xs, dows)]

    def var(v):
        m = sum(v) / n
        return sum((a - m) ** 2 for a in v) / (n - 1)

    seas = max(0.0, 1 - var(resid) / var(detr))
    tr_s = max(0.0, 1 - var(resid) / var(deseason))
    peak = min(w for w in eff if eff[w] == max(eff.values()))
    return round(seas, 4), round(tr_s, 4), peak, round(var(resid) ** 0.5, 4)


def test_seasonal_strength_weekend_spike(spark, tmp_path):
    counts = [10, 10, 10, 10, 10, 30, 30] * 4   # day 0 = Thursday
    _write_daily_counts(spark, tmp_path, counts)
    r = q_seasonal_strength_score(spark, str(tmp_path)).collect()[0]
    seas, tr_s, peak, rsd = _strength_mirror(counts)
    assert r["n_days"] == 28
    assert r["seasonal_strength"] == seas
    assert r["trend_strength"] == tr_s
    assert r["peak_dow_0sun"] == peak
    assert r["resid_sd"] == rsd
    # a pure weekly pattern: seasonality dominates; day 0 is a Thursday
    # so the spikes at positions 5-6 land on Tue/Wed (dow 2 and 3)
    assert r["seasonal_strength"] > 0.8
    assert r["peak_dow_0sun"] in (2, 3)


def test_seasonal_strength_constant_series_is_null(spark, tmp_path):
    _write_daily_counts(spark, tmp_path, [10] * 14)
    r = q_seasonal_strength_score(spark, str(tmp_path)).collect()[0]
    # zero variance everywhere: the nullif guard makes the ratio NULL and
    # greatest() (NULL-skipping in BOTH engines) floors it to 0 — "no
    # seasonality detectable", never a divide-by-zero
    assert r["seasonal_strength"] == 0.0
    assert r["trend_strength"] == 0.0
    assert r["resid_sd"] == 0.0
