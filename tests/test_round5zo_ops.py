"""Round-5 batch-43 operators on crafted inputs, verified against
independent Python computations: delta_encoding_win (FOR/delta bit
widths under candidate sorts), centering_effect_preview (common-
direction removal), dup_discovery_power (sampled-audit detection
probability)."""

from __future__ import annotations

import math
from collections import Counter

from pdf_extractor_spark.queries import (
    _DUP_POWER_FRACS,
    q_centering_effect_preview,
    q_delta_encoding_win,
    q_dup_discovery_power,
)


def _write_docs_nchars(spark, path, vals):
    spark.createDataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate(vals, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


# ----------------------------------------------------------- delta_encoding_win


def _delta_py(vals):
    out = {}
    for name, stream in (
            ("by_doc_id", list(vals)),
            ("by_value", sorted(vals))):
        ds = [abs(b - a) for a, b in zip(stream, stream[1:])]
        mx = max(ds)
        bits = max(1.0, math.ceil(math.log2(mx + 1)) + 1)
        out[name] = {
            "n_values": len(stream),
            "max_abs_delta": mx,
            "mean_abs_delta": round(sum(ds) / len(ds), 2),
            "delta_bits": int(bits),
            "vs_plain64": round(1 - bits / 64, 4),
        }
    return out


def test_delta_encoding_matches_python(spark, tmp_path):
    # a smooth value range arriving in (deterministically) shuffled
    # order: arrival deltas span the range, sorted deltas are tiny
    base = [1000 + 13 * i for i in range(40)]
    import hashlib
    vals = sorted(
        base,
        key=lambda v: hashlib.md5(str(v).encode()).hexdigest())
    _write_docs_nchars(spark, tmp_path, vals)
    want = _delta_py(vals)
    got = {r["ordering"]: r
           for r in q_delta_encoding_win(spark, str(tmp_path)).collect()}
    assert set(got) == {"by_doc_id", "by_value"}
    for name, w in want.items():
        for k, v in w.items():
            assert got[name][k] == v, (name, k, got[name][k], v)
    # the sort pays off: fewer bits per value after ordering by value
    assert got["by_value"]["delta_bits"] < got["by_doc_id"]["delta_bits"]
    assert got["by_value"]["vs_plain64"] > got["by_doc_id"]["vs_plain64"]


def test_delta_encoding_constant_column_one_bit(spark, tmp_path):
    _write_docs_nchars(spark, tmp_path, [500] * 12)
    got = {r["ordering"]: r
           for r in q_delta_encoding_win(spark, str(tmp_path)).collect()}
    for r in got.values():
        assert r["max_abs_delta"] == 0
        assert r["delta_bits"] == 1      # log2(1)=0, +sign, floored at 1
        assert r["vs_plain64"] == round(1 - 1 / 64, 4)


# ------------------------------------------------------ centering_effect_preview


def _center_py(rows):
    import numpy as np

    ids = [i for i, _ in rows]
    mat = {i: np.asarray(v, dtype=np.float32).astype(np.float64)
           for i, v in rows}
    m = np.mean(np.stack(list(mat.values())), axis=0)

    def cos(a, b):
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        if na == 0 or nb == 0:
            return None
        return round(float(a @ b / (na * nb)), 4)

    raws, cens = [], []
    for i in ids:
        if i + 1 not in mat:
            continue
        r = cos(mat[i], mat[i + 1])
        c = cos(mat[i] - m, mat[i + 1] - m)
        if r is not None and c is not None:
            raws.append(r)
            cens.append(c)
    norms = [float(np.sqrt(v @ v)) for v in mat.values()]
    norms = [n for n in norms if n > 0]
    mnorm = float(np.sqrt(m @ m))
    return {
        "n_pairs": len(raws),
        "mean_cos_raw": round(sum(raws) / len(raws), 4),
        "mean_cos_centered": round(sum(cens) / len(cens), 4),
        "mean_norm_share": round(mnorm / (sum(norms) / len(norms)), 4),
    }


def test_centering_collapses_common_direction(spark, tmp_path):
    # every vector = big shared direction + small per-vector signal
    rows = []
    for i in range(12):
        v = [10.0, 10.0, 0.0, 0.0]
        v[2 + (i % 2)] = 1.0 if i % 4 < 2 else -1.0
        rows.append((i, v))
    _write_embeddings(spark, tmp_path, rows)
    want = _center_py(rows)
    r = q_centering_effect_preview(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert r["mean_cos_raw"] > 0.9          # everything looks similar
    assert r["mean_cos_centered"] < 0.3     # ...until the mean is gone
    assert r["mean_norm_share"] > 0.8


def test_centering_isotropic_cloud_small_shift(spark, tmp_path):
    # symmetric +-1 cloud: the mean is ~0, centering changes nothing
    rows = []
    vecs = [[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0], [0, -1.0, 0],
            [0, 0, 1.0], [0, 0, -1.0]]
    for i, v in enumerate(vecs):
        rows.append((i, v))
    _write_embeddings(spark, tmp_path, rows)
    want = _center_py(rows)
    r = q_centering_effect_preview(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert r["mean_norm_share"] == 0.0
    assert r["mean_cos_raw"] == r["mean_cos_centered"]


# ------------------------------------------------------------ dup_discovery_power


def _dup_power_py(texts):
    sizes = Counter(Counter(texts).values())
    hist = {k: g for k, g in sizes.items() if k >= 2}
    total = sum(hist.values())
    out = {}
    for num, den in _DUP_POWER_FRACS:
        p = num / den
        exp_found = sum(
            g * (1 - (1 - p) ** k - k * p * (1 - p) ** (k - 1))
            for k, g in hist.items())
        out[round(p, 4)] = {
            "dup_groups_total": total,
            "expected_groups_found": round(exp_found, 2),
            "discovery_power": round(exp_found / total, 4),
        }
    return out


def test_dup_power_matches_closed_form(spark, tmp_path):
    texts = ["pair dup A"] * 2 + ["pair dup B"] * 2 + ["big dup"] * 5
    texts += [f"unique {i}" for i in range(20)]
    _write_docs(spark, tmp_path, texts)
    want = _dup_power_py(texts)
    got = {r["sample_frac"]: r
           for r in q_dup_discovery_power(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for f, w in want.items():
        for k, v in w.items():
            assert got[f][k] == v, (f, k, got[f][k], v)
    powers = [got[f]["discovery_power"] for f in sorted(got)]
    assert powers == sorted(powers)      # more sample, more power
    # the audit-trap number: a 1% sample is nearly blind to pair dups
    assert got[0.01]["discovery_power"] < 0.01
