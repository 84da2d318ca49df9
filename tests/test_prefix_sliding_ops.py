"""Boilerplate-prefix LCP and sliding-window distinct on crafted inputs:
the min/max-lexicographic LCP trick checked against hand-known prefixes
(including the single-doc, no-common-prefix, and all-empty degenerate
groups), and the 15/5-minute sliding fan-out with hand-counted per-window
distinct users."""

from __future__ import annotations

import pandas as pd


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
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


# --------------------------------------------------------- boilerplate_prefix


def test_lcp_by_hand_including_degenerates(spark, tmp_path):
    from pdf_extractor_spark.queries import q_boilerplate_prefix

    _write_documents(
        spark,
        tmp_path,
        [
            (0, "Terms of Use: alpha text", "site_a"),
            (1, "Terms of Use: beta text", "site_a"),
            (2, "Terms of Use: zz", "site_a"),
            (3, "completely different", "site_b"),
            (4, "nothing shared here", "site_b"),
            (5, "single document body", "site_c"),
            (6, "", "site_d"),
            (7, "", "site_d"),
        ],
    )
    out = {r["source"]: r for r in q_boilerplate_prefix(spark, str(tmp_path)).collect()}
    assert out["site_a"]["lcp_len"] == len("Terms of Use: ")
    assert out["site_a"]["prefix"] == "Terms of Use: "
    assert out["site_b"]["lcp_len"] == 0 and out["site_b"]["prefix"] == ""
    # single-doc group: the trivial full-text prefix
    assert out["site_c"]["lcp_len"] == len("single document body")
    assert out["site_d"]["lcp_len"] == 0 and out["site_d"]["prefix"] == ""


def test_lcp_one_text_prefix_of_another(spark, tmp_path):
    from pdf_extractor_spark.queries import q_boilerplate_prefix

    # min('abc','abcdef') pair: no mismatch within the shorter — lcp = 3
    _write_documents(spark, tmp_path, [(0, "abc", "s"), (1, "abcdef", "s")])
    r = q_boilerplate_prefix(spark, str(tmp_path)).collect()[0]
    assert (r["lcp_len"], r["prefix"]) == (3, "abc")


# ------------------------------------------------------- sliding_active_users


def test_sliding_windows_fan_out_and_distinct(spark, tmp_path):
    from pdf_extractor_spark.queries import q_sliding_active_users

    _write_events(
        spark,
        tmp_path,
        [
            # 10:07 -> windows starting 09:55, 10:00, 10:05
            (1, "2024-01-01 10:07:00", 1, "view", 0.0),
            # 10:12 -> windows 10:00, 10:05, 10:10
            (2, "2024-01-01 10:12:00", 2, "view", 0.0),
            # same user again at 10:13 -> distinct must collapse
            (3, "2024-01-01 10:13:00", 2, "click", 0.0),
        ],
    )
    out = {
        r["window_start"]: (r["n_events"], r["n_users"])
        for r in q_sliding_active_users(spark, str(tmp_path)).collect()
    }
    assert out["2024-01-01 09:55:00"] == (1, 1)
    assert out["2024-01-01 10:00:00"] == (3, 2)   # all events, users {1,2}
    assert out["2024-01-01 10:05:00"] == (3, 2)
    assert out["2024-01-01 10:10:00"] == (2, 1)   # user 2 twice, once distinct
    assert len(out) == 4
