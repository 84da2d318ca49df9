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


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    pdf["props"] = "{}"
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _hourly_events(rows, eid, type_name, counts):
    for hour, n in enumerate(counts):
        for i in range(n):
            eid += 1
            rows.append(
                (eid, f"2024-01-01T{hour:02d}:{i:02d}:00", 1, type_name, 1.0)
            )
    return eid


def test_type_correlation_coupled_and_anti(spark, tmp_path):
    from pdf_extractor_spark.queries import q_type_correlation

    rows, eid = [], 0
    up = [1, 2, 3, 4, 5, 6, 7, 8]
    eid = _hourly_events(rows, eid, "a_up", up)
    eid = _hourly_events(rows, eid, "b_up", [2 * x for x in up])     # r = +1
    eid = _hourly_events(rows, eid, "c_down", [9 - x for x in up])   # r = -1
    _write_events(spark, tmp_path, rows)
    out = (
        q_type_correlation(spark, str(tmp_path))
        .toPandas()
        .set_index(["type_a", "type_b"])
    )
    assert out.loc[("a_up", "b_up"), "pearson_r"] == pytest.approx(1.0)
    assert bool(out.loc[("a_up", "b_up"), "strongly_coupled"])
    assert out.loc[("a_up", "c_down"), "pearson_r"] == pytest.approx(-1.0)
    assert out.loc[("b_up", "c_down"), "pearson_r"] == pytest.approx(-1.0)


def test_type_correlation_constant_series_degrades_to_zero(spark, tmp_path):
    from pdf_extractor_spark.queries import q_type_correlation

    rows, eid = [], 0
    eid = _hourly_events(rows, eid, "flat", [3] * 6)
    eid = _hourly_events(rows, eid, "vary", [1, 2, 3, 4, 5, 6])
    _write_events(spark, tmp_path, rows)
    out = q_type_correlation(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["pearson_r"] == 0.0 and not bool(out["strongly_coupled"])


def test_autocorrelation_ramp_vs_alternation(spark, tmp_path):
    from pdf_extractor_spark.queries import q_autocorrelation

    rows, eid = [], 0
    eid = _hourly_events(rows, eid, "ramp", [1, 2, 3, 4, 5, 6, 7, 8])
    eid = _hourly_events(rows, eid, "flip", [1, 9, 1, 9, 1, 9, 1, 9])
    _write_events(spark, tmp_path, rows)
    out = q_autocorrelation(spark, str(tmp_path)).toPandas().set_index("event_type")
    # a linear ramp's lag-1 pairs are themselves linear: r = 1
    assert out.loc["ramp", "acf_lag1"] == pytest.approx(1.0)
    assert bool(out.loc["ramp", "has_memory"])
    # perfect alternation anti-correlates
    assert out.loc["flip", "acf_lag1"] == pytest.approx(-1.0)
    assert not bool(out.loc["flip", "has_memory"])
