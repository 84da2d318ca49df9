"""Lexical-signature + robust-stats operators on crafted inputs:
fightin'-words topic signatures, hapax legomena rates, conditional
transition entropy, p1/p99 winsorization.  Parity is covered by the
contract gate; these pin SEMANTICS by hand."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    q_hapax_rate,
    q_topic_signature,
    q_transition_entropy,
    q_winsorize_values,
)


def _write_documents_sources(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


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


# ------------------------------------------------------------ topic_signature


def test_topic_signature_hand_computed_log_odds(spark, tmp_path):
    rows = [
        (0, "apple apple apple banana", "en", "A"),
        (1, "carrot carrot", "en", "B"),
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_topic_signature(spark, str(tmp_path)).toPandas()
    a = out[out.source == "A"].set_index("token")
    # apple in A: y_sw=3, n_s=4, y_w=3, n=6 ->
    # ln((3+1)/(4+10000)) - ln((0+1)/(6-4+10000))
    expect = round(math.log(4 / 10004) - math.log(1 / 10002), 4)
    assert a.loc["apple", "log_odds"] == pytest.approx(expect)
    assert a.loc["apple", "n_in_source"] == 3 and a.loc["apple", "n_in_rest"] == 0
    # apple is A's most distinctive token; carrot is B's
    assert a.loc["apple", "rank_pos"] == 1
    b = out[out.source == "B"].set_index("token")
    assert b.loc["carrot", "rank_pos"] == 1
    # a token of the OTHER source scores negative if it surfaces at all
    assert (out[out.source == "A"]["log_odds"].iloc[0]
            > out[out.source == "A"]["log_odds"].iloc[-1])


def test_topic_signature_caps_at_five_per_source(spark, tmp_path):
    text = " ".join(f"w{i}" for i in range(20))
    _write_documents_sources(spark, tmp_path, [(0, text, "en", "A"),
                                               (1, "other", "en", "B")])
    out = q_topic_signature(spark, str(tmp_path)).toPandas()
    assert (out.groupby("source").size() <= 5).all()
    # ties (all w* have identical counts) break by token text ascending
    a = out[out.source == "A"].sort_values("rank_pos")
    assert list(a["token"]) == ["w0", "w1", "w10", "w11", "w12"]


# ---------------------------------------------------------------- hapax_rate


def test_hapax_rate_hand_computed(spark, tmp_path):
    _write_documents_sources(spark, tmp_path, [(0, "a a b c", "en", "A")])
    out = q_hapax_rate(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["n_occurrences"] == 4 and out["n_types"] == 3
    assert out["n_hapax"] == 2
    assert out["hapax_type_rate"] == pytest.approx(round(2 / 3, 4))
    assert out["hapax_occurrence_rate"] == pytest.approx(0.5)


def test_hapax_rate_is_per_source_not_global(spark, tmp_path):
    # "rare" occurs once in EACH source: still hapax in both independently
    rows = [(0, "rare common common", "en", "A"),
            (1, "rare common common", "en", "B")]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_hapax_rate(spark, str(tmp_path)).toPandas().set_index("source")
    assert out.loc["A", "n_hapax"] == 1 and out.loc["B", "n_hapax"] == 1


# -------------------------------------------------------- transition_entropy


def test_transition_entropy_uniform_two_way_is_one_bit(spark, tmp_path):
    rows = [
        (1, "2024-01-01T10:00:00", 1, "A", 1.0),
        (2, "2024-01-01T10:01:00", 1, "B", 1.0),
        (3, "2024-01-01T10:00:00", 2, "A", 1.0),
        (4, "2024-01-01T10:01:00", 2, "C", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_transition_entropy(spark, str(tmp_path)).toPandas().set_index("prev_type")
    a = out.loc["A"]
    assert a["n_transitions"] == 2 and a["n_successors"] == 2
    assert a["entropy_bits"] == pytest.approx(1.0)
    assert a["branching_factor"] == pytest.approx(2.0)


def test_transition_entropy_deterministic_successor_is_zero_bits(spark, tmp_path):
    rows = [
        (1, "2024-01-01T10:00:00", 1, "A", 1.0),
        (2, "2024-01-01T10:01:00", 1, "B", 1.0),
        (3, "2024-01-01T10:02:00", 1, "A", 1.0),
        (4, "2024-01-01T10:03:00", 1, "B", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_transition_entropy(spark, str(tmp_path)).toPandas().set_index("prev_type")
    assert out.loc["A", "entropy_bits"] == 0.0
    assert out.loc["A", "branching_factor"] == 1.0


# ---------------------------------------------------------- winsorize_values


def test_winsorize_values_symmetric_clip_preserves_mean(spark, tmp_path):
    rows = [
        (i, "2024-01-01T10:00:00", 1, "A", float(i)) for i in range(100)
    ]
    _write_events(spark, tmp_path, rows)
    out = q_winsorize_values(spark, str(tmp_path)).toPandas().iloc[0]
    # linear-interpolated exact percentiles over 0..99
    assert out["p01"] == pytest.approx(0.99)
    assert out["p99"] == pytest.approx(98.01)
    assert out["n_clipped_low"] == 1 and out["n_clipped_high"] == 1
    assert out["mean_raw"] == pytest.approx(49.5)
    # symmetric tails: clipping 0->0.99 and 99->98.01 cancels exactly
    assert out["mean_winsorized"] == pytest.approx(49.5)


def test_winsorize_values_outlier_moves_mean_not_winsorized(spark, tmp_path):
    rows = [(i, "2024-01-01T10:00:00", 1, "A", 1.0) for i in range(99)]
    rows.append((99, "2024-01-01T10:30:00", 2, "A", 1000.0))
    _write_events(spark, tmp_path, rows)
    out = q_winsorize_values(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["mean_raw"] == pytest.approx(round((99 + 1000) / 100, 4))
    # p99 interpolates between the last 1.0 and the outlier; the winsorized
    # mean must land far below the raw mean
    assert out["mean_winsorized"] < out["mean_raw"]
    assert out["n_clipped_high"] == 1
