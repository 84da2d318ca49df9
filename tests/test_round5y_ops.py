"""Round-5 batch-34 operators on crafted inputs, verified against
independent Python computations: deming_token_calibration (exact-line
corpus pins slope/intercept/r; the bracket collapses when x fully
determines y), trend_influence_audit (closed-form leverage/studentized/
Cook's mirror with a spike day flagged), quality_gate_sensitivity
(variant-by-variant set algebra over docs placed strictly inside each
perturbation band)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pdf_extractor_spark.queries import (
    _QGATE_LEN,
    _QGATE_PUNCT,
    q_deming_token_calibration,
    q_quality_gate_sensitivity,
    q_trend_influence_audit,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_documents_text(spark, path, texts):
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    pdf["lang"], pdf["source"] = "en", "crafted"
    pdf["n_chars"] = pdf["text"].str.len()
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


# ------------------------------------------------------ deming_token_calibration


def test_deming_exact_line_pins_all_three_slopes(spark, tmp_path):
    # text of k tokens 'ab' joined by spaces: chars = 3k - 1 exactly,
    # so every regression (OLS, reverse, Deming) must sit on y = 3x - 1
    texts = [" ".join(["ab"] * k) for k in (5, 10, 15, 20, 30)]
    _write_documents_text(spark, tmp_path, texts)
    r = q_deming_token_calibration(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 5
    assert r["chars_per_token_ols"] == 3.0
    assert r["chars_per_token_reverse"] == 3.0
    assert r["chars_per_token_deming"] == 3.0
    assert r["deming_intercept"] == -1.0
    assert r["pearson_r"] == 1.0


def test_deming_sits_between_ols_and_reverse(spark, tmp_path):
    # perturb lengths off the line with trailing dots (punct: not tokens)
    texts = [" ".join(["ab"] * k) + "." * ((k * 7) % 11)
             for k in (5, 8, 10, 14, 15, 20, 24, 30)]
    _write_documents_text(spark, tmp_path, texts)
    r = q_deming_token_calibration(spark, str(tmp_path)).collect()[0]
    xs = [float(k) for k in (5, 8, 10, 14, 15, 20, 24, 30)]
    ys = [3.0 * k - 1 + ((int(k) * 7) % 11) for k in xs]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    cxx = sum(x * x for x in xs) - sx * sx / n
    cyy = sum(y * y for y in ys) - sy * sy / n
    cxy = sum(x * y for x, y in zip(xs, ys)) - sx * sy / n
    b_ols, b_rev = cxy / cxx, cyy / cxy
    b_dem = ((cyy - cxx) + ((cyy - cxx) ** 2 + 4 * cxy * cxy) ** 0.5) \
        / (2 * cxy)
    assert r["chars_per_token_ols"] == round(b_ols, 4)
    assert r["chars_per_token_reverse"] == round(b_rev, 4)
    assert r["chars_per_token_deming"] == round(b_dem, 4)
    # attenuation ordering: OLS <= Deming <= reverse for positive corr
    assert (r["chars_per_token_ols"] <= r["chars_per_token_deming"]
            <= r["chars_per_token_reverse"])


# -------------------------------------------------------- trend_influence_audit


def test_trend_influence_flags_spike_day(spark, tmp_path):
    counts = [10, 11, 12, 11, 13, 40, 12, 13, 11, 12, 14, 13]
    _write_daily_counts(spark, tmp_path, counts)
    out = q_trend_influence_audit(spark, str(tmp_path)).collect()
    ys = [float(c) for c in counts]
    n = float(len(ys))
    ts = [float(t) for t in range(1, len(ys) + 1)]
    mt, my = sum(ts) / n, sum(ys) / n
    cxx = sum(t * t for t in ts) - sum(ts) ** 2 / n
    cxy = sum(t * y for t, y in zip(ts, ys)) - sum(ts) * sum(ys) / n
    cyy = sum(y * y for y in ys) - sum(ys) ** 2 / n
    b = cxy / cxx
    s2 = (cyy - cxy * cxy / cxx) / (n - 2)
    flagged = []
    for r, t, y in zip(out, ts, ys):
        fit = my + b * (t - mt)
        e = y - fit
        h = 1 / n + (t - mt) ** 2 / cxx
        stud = e / (s2 * (1 - h)) ** 0.5
        cook = (e * e / (s2 * (1 - h))) * h / (2 * (1 - h))
        assert r["fitted"] == round(fit, 4)
        assert r["residual"] == round(e, 4)
        assert r["leverage"] == round(h, 4)
        assert r["studentized"] == round(stud, 4)
        assert r["cooks_d"] == round(cook, 4)
        assert r["influential"] == (1 if cook > 4 / n else 0)
        if r["influential"]:
            flagged.append(r["day_index"])
    # the crafted spike (day 6) must be flagged
    assert 6 in flagged
    # endpoints have the max leverage; the center days the min
    levs = [r["leverage"] for r in out]
    assert max(levs) == levs[0] == levs[-1]
    assert min(levs) == levs[5] == levs[6]


# ----------------------------------------------------- quality_gate_sensitivity


def _gate_mirror(docs):
    lo, hi = _QGATE_LEN
    plo, phi = _QGATE_PUNCT
    variants = {
        "len_loose": (lo * 0.8, hi * 1.2, plo, phi),
        "len_tight": (lo * 1.2, hi * 0.8, plo, phi),
        "punct_loose": (lo, hi, plo * 0.8, phi * 1.2),
        "punct_tight": (lo, hi, plo * 1.2, phi * 0.8),
    }

    def keep(nc, p, bounds):
        a, b, c, d = bounds
        return 1 if (a <= nc <= b and c <= p <= d) else 0

    base = [keep(nc, p, (lo, hi, plo, phi)) for nc, p in docs]
    out = {}
    for name, bounds in variants.items():
        ks = [keep(nc, p, bounds) for nc, p in docs]
        both = sum(a * b for a, b in zip(ks, base))
        out[name] = {
            "kept": sum(ks), "kept_base": sum(base), "both": both,
            "flip_in": sum(a * (1 - b) for a, b in zip(ks, base)),
            "flip_out": sum((1 - a) * b for a, b in zip(ks, base)),
        }
    return out


def test_gate_sensitivity_set_algebra(spark, tmp_path):
    # (length, punct-count) pairs placed strictly inside single bands:
    # 180: only len_loose keeps; 300: everyone keeps; 5000/21 (p=.0042):
    # only punct_loose keeps; 1000/180 (p=.18): punct_tight rejects;
    # 45000: len_tight rejects
    spec = [(180, 4), (300, 6), (5000, 21), (1000, 180), (45000, 450)]
    texts = ["a" * (L - m) + "." * m for L, m in spec]
    _write_documents_text(spark, tmp_path, texts)
    out = {r["variant"]: r
           for r in q_quality_gate_sensitivity(spark, str(tmp_path)).collect()}
    mirror = _gate_mirror([(float(L), m / L) for L, m in spec])
    n = len(spec)
    assert sorted(out) == sorted(mirror)
    for name, m in mirror.items():
        r = out[name]
        assert r["n_docs"] == n
        assert r["base_keep_rate"] == round(m["kept_base"] / n, 4)
        assert r["variant_keep_rate"] == round(m["kept"] / n, 4)
        union = m["kept"] + m["kept_base"] - m["both"]
        assert r["jaccard_vs_base"] == round(m["both"] / union, 4)
        assert (r["n_flip_in"], r["n_flip_out"]) == (m["flip_in"],
                                                     m["flip_out"])
    # directionality: loose variants only flip IN, tight only flip OUT
    assert out["len_loose"]["n_flip_in"] == 1
    assert out["len_loose"]["n_flip_out"] == 0
    assert out["punct_loose"]["n_flip_in"] == 1
    assert out["len_tight"]["n_flip_out"] == 1
    assert out["punct_tight"]["n_flip_out"] == 1
    assert out["punct_tight"]["n_flip_in"] == 0
