"""Calibration, robust-outlier, and seasonality ops on crafted inputs:
the score-0 fixed point of the sigmoid lands in bucket 5, MAD outliers
match the Iglewicz-Hoaglin arithmetic by hand (including the constant
and the mad=0 degenerate types), and hour-of-day shares/peaks are
hand-counted."""

from __future__ import annotations

import pandas as pd


def _write_documents(spark, path, rows):
    """rows: (doc_id, text)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "crafted"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    pdf["props"] = "{}"
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# --------------------------------------------------------- quality_calibration


def test_calibration_score_zero_fixed_point(spark, tmp_path):
    from pdf_extractor_spark.queries import q_quality_calibration

    # tokenless doc: classifier score 0 -> prob exactly 0.5 -> bucket 5,
    # clf keeps (>= 0), heuristic rejects (too short)
    _write_documents(spark, tmp_path, [(0, ""), (1, "   ")])
    rows = q_quality_calibration(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["prob_bucket"] == 5
    assert r["n_docs"] == 2
    assert r["clf_keep_rate"] == 1.0
    assert r["heuristic_ok_rate"] == 0.0
    assert r["mean_prob"] == 0.5


def test_calibration_buckets_partition_corpus(spark):
    from pdf_extractor_spark.queries import q_quality_calibration

    rows = q_quality_calibration(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_docs"] for r in rows) == 500  # sf0.001 documents count
    for r in rows:
        assert 0 <= r["prob_bucket"] <= 9
        lo, hi = r["prob_bucket"] / 10, (r["prob_bucket"] + 1) / 10
        assert lo <= r["mean_prob"] <= (1.0 if r["prob_bucket"] == 9 else hi)


# -------------------------------------------------------------- robust_outliers


def test_mad_outlier_by_hand(spark, tmp_path):
    from pdf_extractor_spark.queries import q_robust_outliers

    base = "2024-01-01 10:00:0"
    _write_events(
        spark,
        tmp_path,
        [(i, f"{base}{i}", 1, "view", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])]
        + [(10 + i, f"{base}{i}", 2, "click", 5.0) for i in range(3)],
    )
    out = {r["event_id"]: r for r in q_robust_outliers(spark, str(tmp_path)).collect()}
    # view: med 3, adev {2,1,0,1,97}, mad 1
    spike = out[4]
    assert (spike["med"], spike["mad"]) == (3.0, 1.0)
    assert spike["robust_z"] == round(0.6745 * 97, 4)
    assert spike["is_outlier"]
    low = out[0]
    assert low["robust_z"] == round(0.6745 * -2, 4)
    assert not low["is_outlier"]
    # click: constant -> mad 0 -> z degrades to 0, never a crash or flag
    for eid in (10, 11, 12):
        assert out[eid]["mad"] == 0.0
        assert out[eid]["robust_z"] == 0.0
        assert not out[eid]["is_outlier"]


# ------------------------------------------------------------ activity_profile


def test_activity_profile_shares_and_peak(spark, tmp_path):
    from pdf_extractor_spark.queries import q_activity_profile

    _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 10:05:00", 1, "view", 0.0),
            (2, "2024-01-01 10:45:00", 2, "view", 0.0),
            (3, "2024-01-01 11:05:00", 1, "view", 0.0),
            (4, "2024-01-02 23:59:59", 3, "click", 0.0),
        ],
    )
    out = {
        (r["event_type"], r["hour_of_day"]): r
        for r in q_activity_profile(spark, str(tmp_path)).collect()
    }
    v10 = out[("view", 10)]
    assert (v10["n_events"], v10["share"], v10["is_peak_hour"]) == (2, 0.6667, True)
    v11 = out[("view", 11)]
    assert (v11["n_events"], v11["share"], v11["is_peak_hour"]) == (1, 0.3333, False)
    c23 = out[("click", 23)]
    assert (c23["n_events"], c23["share"], c23["is_peak_hour"]) == (1, 1.0, True)
