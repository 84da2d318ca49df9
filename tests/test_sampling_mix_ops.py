"""Weighted sampling (Efraimidis–Spirakis) + temperature mixing on
crafted inputs, verified against independent Python reimplementations."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from pdf_extractor_spark.queries import q_temperature_mix, q_weighted_sample


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _aes_key(doc_id: int, weight: int) -> float:
    """Independent reimplementation of the engine's sampling key."""
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    u = (h + 1.0) / 4294967297.0
    return math.log(u) / max(weight, 1)


def test_weighted_sample_matches_independent_reimplementation(spark, tmp_path):
    rows = []
    for i in range(12):
        rows.append((i, "x" * (1 + 97 * i), "en", "A"))
    for i in range(12, 20):
        rows.append((i, "y" * (5 + 13 * i), "en", "B"))
    _write_documents(spark, tmp_path, rows)
    out = q_weighted_sample(spark, str(tmp_path)).toPandas()

    expect = pd.DataFrame(
        [(r[3], r[0], len(r[1]), _aes_key(r[0], len(r[1]))) for r in rows],
        columns=["source", "doc_id", "weight", "key"],
    )
    expect["rk"] = expect.groupby("source")["key"].rank(
        ascending=False, method="first"
    )
    top = expect[expect.rk <= 5]
    for src in ("A", "B"):
        got = out[out.source == src].sort_values("sample_rank")
        want = top[top.source == src].sort_values("rk")
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert (got["sample_rank"] <= 5).all() and len(got) == 5
        # reported ppm key matches the reimplementation
        for _, g in got.iterrows():
            k = _aes_key(int(g["doc_id"]), int(g["weight"]))
            assert g["key_ppm"] == pytest.approx(round(k * 1e6, 4), abs=1e-3)


def test_weighted_sample_heavier_docs_win_more(spark, tmp_path):
    # one-sided sanity at scale: among many equal-hash-quality docs, the
    # mean weight of winners should exceed the population mean
    rows = [(i, "z" * (10 if i % 2 else 2000), "en", "A") for i in range(60)]
    _write_documents(spark, tmp_path, rows)
    out = q_weighted_sample(spark, str(tmp_path)).toPandas()
    assert out["weight"].mean() > pd.Series(
        [10 if i % 2 else 2000 for i in range(60)]
    ).mean()


# ------------------------------------------------------------ temperature_mix


def test_temperature_mix_hand_computed(spark, tmp_path):
    rows = [
        (0, " ".join(["tok"] * 90), "en", "big"),
        (1, " ".join(["tok"] * 10), "en", "small"),
    ]
    _write_documents(spark, tmp_path, rows)
    out = q_temperature_mix(spark, str(tmp_path)).toPandas().set_index("source")
    qb, qs = 0.9 ** 0.7, 0.1 ** 0.7
    z = qb + qs
    assert out.loc["big", "p_natural"] == pytest.approx(0.9)
    assert out.loc["big", "p_temperature"] == pytest.approx(round(qb / z, 4))
    assert out.loc["small", "p_temperature"] == pytest.approx(round(qs / z, 4))
    # flattening: small upsampled, big downsampled, order preserved
    assert out.loc["small", "upsample_factor"] > 1.0
    assert out.loc["big", "upsample_factor"] < 1.0
    assert (
        out.loc["big", "p_temperature"] > out.loc["small", "p_temperature"]
    )


def test_temperature_mix_uniform_is_fixed_point(spark, tmp_path):
    rows = [(i, " ".join(["w"] * 50), "en", f"s{i}") for i in range(4)]
    _write_documents(spark, tmp_path, rows)
    out = q_temperature_mix(spark, str(tmp_path)).toPandas()
    assert (out["p_temperature"] == 0.25).all()
    assert (out["upsample_factor"] == 1.0).all()
