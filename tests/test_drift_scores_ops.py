"""PSI + Jensen-Shannon drift scores on crafted inputs, verified against
independent Python computations."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pdf_extractor_spark.queries import q_jsd_sources, q_psi_drift


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------------------ psi_drift


def test_psi_drift_stable_corpus_not_flagged(spark, tmp_path):
    rows = [(i, "x" * (50 + i % 10), "en", "A") for i in range(100)]
    _write_documents(spark, tmp_path, rows)
    out = q_psi_drift(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["n_old"] == 79 and out["n_new"] == 21
    assert abs(out["psi"]) < 0.1
    assert not bool(out["moderate_shift"]) and not bool(out["major_shift"])


def test_psi_drift_length_explosion_is_major(spark, tmp_path):
    rows = [(i, "x" * (50 + i % 10), "en", "A") for i in range(79)]
    rows += [(79 + i, "y" * 5000, "en", "A") for i in range(21)]
    _write_documents(spark, tmp_path, rows)
    out = q_psi_drift(spark, str(tmp_path)).toPandas().iloc[0]
    # every arrival doc lands above the reference's top decile
    assert out["psi"] > 0.2
    assert bool(out["major_shift"]) and bool(out["moderate_shift"])


# ---------------------------------------------------------------- jsd_sources


def _jsd(pa, pb):
    m = [(x + y) / 2 for x, y in zip(pa, pb)]
    return 0.5 * sum(x * math.log(x / mm) for x, mm in zip(pa, m)) + \
           0.5 * sum(y * math.log(y / mm) for y, mm in zip(pb, m))


def test_jsd_sources_identical_distributions_near_zero(spark, tmp_path):
    rows = [(0, "alpha beta gamma alpha", "en", "A"),
            (1, "alpha beta gamma alpha", "en", "B")]
    _write_documents(spark, tmp_path, rows)
    out = q_jsd_sources(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["jsd"] == 0.0
    assert bool(out["near_duplicate_dist"])


def test_jsd_sources_disjoint_vocab_matches_hand_computation(spark, tmp_path):
    rows = [(0, " ".join(["x"] * 10), "en", "A"),
            (1, " ".join(["y"] * 10), "en", "B")]
    _write_documents(spark, tmp_path, rows)
    out = q_jsd_sources(spark, str(tmp_path)).toPandas().iloc[0]
    # support {x, y}; smoothed counts A: (11, 1)/12, B: (1, 11)/12
    pa, pb = [11 / 12, 1 / 12], [1 / 12, 11 / 12]
    assert out["jsd"] == pytest.approx(round(_jsd(pa, pb), 4))
    assert out["jsd"] <= math.log(2) + 1e-9
    assert not bool(out["near_duplicate_dist"])
