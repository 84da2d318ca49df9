"""Time-series + vocabulary + edit-distance operators on crafted inputs:
sweep-line session concurrency, level-shift changepoints, truncated EWMA,
OOV vocabulary coverage, Flesch readability, banded Levenshtein pairs.
Engine-vs-oracle parity is covered by the contract gate; these pin the
SEMANTICS on inputs small enough to verify by hand."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    q_edit_distance_pairs,
    q_ewma_hourly,
    q_level_shift,
    q_readability,
    q_session_concurrency,
    q_vocab_coverage,
)


def _write_documents(spark, path, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": langs,
            "source": ["crafted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


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


HOUR0 = 1704067200  # 2024-01-01T00:00:00Z epoch seconds (UTC session tz)


# ------------------------------------------------------ session_concurrency


def test_session_concurrency_sweep_line(spark, tmp_path):
    rows = [
        # user 1: one session inside hour 10 (10:00, 10:10)
        (1, "2024-01-01T10:00:00", 1, "view", 1.0),
        (2, "2024-01-01T10:10:00", 1, "view", 1.0),
        # user 2: single-event session in hour 10
        (3, "2024-01-01T10:30:00", 2, "view", 1.0),
        # user 3: session crossing the 10->11 hour boundary (gap 20m < 30m)
        (4, "2024-01-01T10:50:00", 3, "view", 1.0),
        (5, "2024-01-01T11:10:00", 3, "view", 1.0),
        # user 1 again: >30m silence -> NEW session in hour 13
        (6, "2024-01-01T13:00:00", 1, "view", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = (
        q_session_concurrency(spark, str(tmp_path))
        .toPandas()
        .set_index("hour_ts")
        .sort_index()
    )
    h = {k: HOUR0 + 3600 * k for k in range(24)}
    # hour 10: three sessions start
    assert out.loc[h[10], "n_starts"] == 3
    assert out.loc[h[10], "active_sessions"] == 3
    # hour 11: users 1+2 sessions closed (end-hour 10 + 1h); user 3 still open
    assert out.loc[h[11], "n_ends"] == 2
    assert out.loc[h[11], "active_sessions"] == 1
    # hour 12: user 3's session closes (last event 11:10 -> closes at 12:00)
    assert out.loc[h[12], "n_ends"] == 1
    assert out.loc[h[12], "active_sessions"] == 0
    # hour 13: user 1's second session opens and is the only one active
    assert out.loc[h[13], "n_starts"] == 1
    assert out.loc[h[13], "active_sessions"] == 1
    # hour 14: it closes
    assert out.loc[h[14], "active_sessions"] == 0
    # sweep-line invariant: starts and ends balance
    assert out["n_starts"].sum() == out["n_ends"].sum() == 4


# ------------------------------------------------------------- level_shift


def test_level_shift_flags_step_change_only(spark, tmp_path):
    rows = []
    eid = 0
    # "step" type: 6 hours at 4 events/h then 6 hours at 10 events/h
    for hour in range(12):
        n = 4 if hour < 6 else 10
        for i in range(n):
            eid += 1
            rows.append(
                (eid, f"2024-01-01T{hour:02d}:{i:02d}:00", 1, "step", 1.0)
            )
    # "flat" type: 12 hours at a constant 5 events/h — must never flag
    for hour in range(12):
        for i in range(5):
            eid += 1
            rows.append(
                (eid, f"2024-01-01T{hour:02d}:{i:02d}:30", 2, "flat", 1.0)
            )
    _write_events(spark, tmp_path, rows)
    out = q_level_shift(spark, str(tmp_path)).toPandas()
    step = out[out.event_type == "step"].set_index("hour_ts")
    # boundary hour 6: before mean = 4 (hours 0..5), after mean = 10
    b = step.loc[HOUR0 + 6 * 3600]
    assert b["before_mean"] == pytest.approx(4.0)
    assert b["after_mean"] == pytest.approx(10.0)
    assert b["shift_score"] == pytest.approx(1.5)
    assert bool(b["is_shift"])
    # the step hour is the ONLY flagged hour for this type
    assert step["is_shift"].sum() == 1
    flat = out[out.event_type == "flat"]
    assert not flat["is_shift"].any()


def test_level_shift_boundary_rows_unflagged(spark, tmp_path):
    # only 4 hours of data: no row ever has full 6+6 context -> no flags,
    # even though the jump is huge
    rows = []
    eid = 0
    for hour in range(4):
        n = 1 if hour < 2 else 30
        for i in range(n):
            eid += 1
            rows.append(
                (eid, f"2024-01-01T{hour:02d}:{i:02d}:00", 1, "burst", 1.0)
            )
    _write_events(spark, tmp_path, rows)
    out = q_level_shift(spark, str(tmp_path)).toPandas()
    assert not out["is_shift"].any()


# -------------------------------------------------------------- ewma_hourly


def test_ewma_hourly_hand_computed(spark, tmp_path):
    rows = []
    eid = 0
    for hour, n in [(0, 2), (1, 4), (2, 8)]:
        for i in range(n):
            eid += 1
            rows.append(
                (eid, f"2024-01-01T{hour:02d}:{i:02d}:00", 1, "view", 1.0)
            )
    _write_events(spark, tmp_path, rows)
    out = (
        q_ewma_hourly(spark, str(tmp_path))
        .toPandas()
        .set_index("hour_ts")
        .sort_index()
    )
    # head renormalization: first row's EWMA is the raw value
    assert out.loc[HOUR0, "ewma"] == pytest.approx(2.0)
    # t1: (4 + 2*0.75) / (1 + 0.75) = 5.5/1.75
    assert out.loc[HOUR0 + 3600, "ewma"] == pytest.approx(round(5.5 / 1.75, 4))
    # t2: (8 + 4*0.75 + 2*0.5625) / (1 + 0.75 + 0.5625)
    expect = round((8 + 3 + 1.125) / 2.3125, 4)
    assert out.loc[HOUR0 + 7200, "ewma"] == pytest.approx(expect)
    assert out.loc[HOUR0 + 7200, "residual"] == pytest.approx(round(8 - 12.125 / 2.3125, 4))


# ----------------------------------------------------------- vocab_coverage


def test_vocab_coverage_rare_tokens_fall_outside_top1000(spark, tmp_path):
    # source A: 1000 distinct tokens, each appearing twice -> they ARE the
    # top-1000 vocabulary.  source B: 5 singletons -> every one is OOV.
    common = " ".join(f"tok{i:04d}" for i in range(1000))
    rows = [
        (0, common, "en", "A"),
        (1, common, "en", "A"),
        (2, "rareone raretwo rarethree rarefour rarefive", "en", "B"),
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = (
        q_vocab_coverage(spark, str(tmp_path)).toPandas().set_index("source")
    )
    a, b = out.loc["A"], out.loc["B"]
    assert a["n_occurrences"] == 2000 and a["n_types"] == 1000
    assert a["oov_occurrences"] == 0 and a["oov_type_rate"] == 0.0
    assert b["n_occurrences"] == 5 and b["n_types"] == 5
    assert b["oov_occurrences"] == 5
    assert b["oov_occurrence_rate"] == 1.0 and b["oov_type_rate"] == 1.0


def test_vocab_coverage_boundary_tie_breaks_by_token_text(spark, tmp_path):
    # 1001 distinct tokens all with frequency 1: rank ties break by token
    # text ascending, so exactly the lexicographically-last token is OOV.
    toks = [f"t{i:04d}" for i in range(1001)]
    _write_documents_sources(spark, tmp_path, [(0, " ".join(toks), "en", "A")])
    out = q_vocab_coverage(spark, str(tmp_path)).toPandas().set_index("source")
    assert out.loc["A", "oov_types"] == 1
    assert out.loc["A", "oov_occurrences"] == 1


# -------------------------------------------------------------- readability


def test_readability_hand_computed_flesch(spark, tmp_path):
    # 1 sentence, 3 words, 3 vowel groups:
    # flesch = 206.835 - 1.015*(3/1) - 84.6*(3/3) = 119.19
    _write_documents(spark, tmp_path, ["The cat sat."])
    out = q_readability(spark, str(tmp_path)).toPandas()
    r = out.iloc[0]
    assert r["n_docs"] == 1 and r["total_words"] == 3
    assert r["mean_words_per_sentence"] == pytest.approx(3.0)
    assert r["mean_syllables_per_word"] == pytest.approx(1.0)
    assert r["mean_flesch"] == pytest.approx(119.19)
    assert r["difficult_rate"] == 0.0


def test_readability_dense_prose_flags_difficult(spark, tmp_path):
    # one long unpunctuated "sentence" of many-syllable words drives the
    # score deep below 30
    hard = " ".join(["onomatopoeia administrative universality"] * 10) + "."
    _write_documents(spark, tmp_path, [hard])
    out = q_readability(spark, str(tmp_path)).toPandas()
    assert out.iloc[0]["mean_flesch"] < 30
    assert out.iloc[0]["difficult_rate"] == 1.0


def test_readability_empty_text_guard(spark, tmp_path):
    _write_documents(spark, tmp_path, ["", "No vowels? Hmm."])
    out = q_readability(spark, str(tmp_path)).toPandas()
    # greatest(...,1) guards: empty doc contributes the neutral 1/1/1 row
    assert out.iloc[0]["n_docs"] == 2


# ------------------------------------------------------- edit_distance_pairs


def test_edit_distance_pairs_bands_and_threshold(spark, tmp_path):
    rows = [
        # same bucket (en, "hello wo", len band 0): distance 1 pair
        (0, "hello world aaaa", "en", "web"),
        (1, "hello world aaab", "en", "web"),
        # same bucket but > 5 edits away from both -> excluded by threshold
        (2, "hello world accccccc", "en", "web"),
        # identical head but different lang -> different bucket, no pair
        (3, "hello world aaaa", "fr", "web"),
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_edit_distance_pairs(spark, str(tmp_path)).toPandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert pairs == {(0, 1)}
    assert out.iloc[0]["edit_dist"] == 1


def test_edit_distance_pairs_bucket_cap_bounds_expansion(spark, tmp_path):
    # 25 near-identical docs in one bucket: the cap keeps the first 20 by
    # doc_id, so pair count is C(20,2), never C(25,2)
    rows = [
        (i, f"prefix text shared by all {i:02d}", "en", "web")
        for i in range(25)
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_edit_distance_pairs(spark, str(tmp_path)).toPandas()
    assert len(out) == 20 * 19 // 2
    assert out.doc_a.max() <= 19 and out.doc_b.max() <= 19
