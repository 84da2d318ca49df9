"""Sequence-analytics operators on crafted event streams: Markov
transition tie-break order, strict funnel stage ordering (out-of-order
completions must NOT count), JSON props null handling, and the
order-SENSITIVITY of the behavioral prefix fingerprint.  Engine-vs-oracle
parity is covered by the contract gate; these pin the SEMANTICS on
inputs small enough to verify by hand."""

from __future__ import annotations

import pandas as pd

from pdf_extractor_spark.queries import (
    q_behavior_fingerprint,
    q_event_funnel,
    q_event_transitions,
    q_json_props_stats,
)

_EVENT_DDL = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, props_json)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    pdf["value"] = 0.0
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        _EVENT_DDL,
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# --------------------------------------------------------- event_transitions


def test_transitions_counts_and_event_id_tiebreak(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            # user 1: view -> click -> click -> purchase
            (1, "2024-01-01 10:00:00", 1, "view", "{}"),
            (2, "2024-01-01 10:01:00", 1, "click", "{}"),
            (3, "2024-01-01 10:02:00", 1, "click", "{}"),
            (4, "2024-01-01 10:03:00", 1, "purchase", "{}"),
            # user 2: ts TIE at 10:00 — order must fall back to event_id,
            # so the sequence is view(10) -> click(11), never the reverse
            (11, "2024-01-01 10:00:00", 2, "click", "{}"),
            (10, "2024-01-01 10:00:00", 2, "view", "{}"),
            # user 3: single event — contributes no transition
            (20, "2024-01-01 10:00:00", 3, "error", "{}"),
        ],
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p_next"])
        for r in q_event_transitions(spark, str(tmp_path)).collect()
    }
    assert out[("view", "click")] == (2, 1.0)  # both users, p=2/2
    assert out[("click", "click")] == (1, 0.5)
    assert out[("click", "purchase")] == (1, 0.5)
    assert ("click", "view") not in out  # tie broke by event_id
    assert ("error", "error") not in out  # no self-transition fabricated
    assert sum(n for n, _ in out.values()) == 4  # 5+2+1 events -> 4 edges


# -------------------------------------------------------------- event_funnel


def test_funnel_requires_strict_stage_order(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            # user 1: full funnel in order
            (1, "2024-01-01 10:00:00", 1, "view", "{}"),
            (2, "2024-01-01 10:05:00", 1, "click", "{}"),
            (3, "2024-01-01 10:10:00", 1, "purchase", "{}"),
            # user 2: click BEFORE view — reaches view only
            (10, "2024-01-01 10:00:00", 2, "click", "{}"),
            (11, "2024-01-01 10:05:00", 2, "view", "{}"),
            (12, "2024-01-01 10:03:00", 2, "purchase", "{}"),
            # user 3: view then purchase, no click — purchase must NOT count
            (20, "2024-01-01 10:00:00", 3, "view", "{}"),
            (21, "2024-01-01 10:05:00", 3, "purchase", "{}"),
            # user 4: never views
            (30, "2024-01-01 10:00:00", 4, "click", "{}"),
            (31, "2024-01-01 10:05:00", 4, "purchase", "{}"),
            # user 5: view -> click, then a LATER second view; purchase
            # after first click still counts (running-min keeps stage 2)
            (40, "2024-01-01 10:00:00", 5, "view", "{}"),
            (41, "2024-01-01 10:01:00", 5, "click", "{}"),
            (42, "2024-01-01 10:02:00", 5, "view", "{}"),
            (43, "2024-01-01 10:03:00", 5, "purchase", "{}"),
        ],
    )
    row = q_event_funnel(spark, str(tmp_path)).collect()[0]
    assert row["reached_view"] == 4  # users 1,2,3,5
    assert row["reached_click"] == 2  # users 1,5 (user 2's click precedes view)
    assert row["reached_purchase"] == 2  # users 1,5
    assert row["conv_view_click"] == 0.5
    assert row["conv_click_purchase"] == 1.0


def test_funnel_same_timestamp_is_not_after(spark, tmp_path):
    # click at the EXACT view timestamp: strict '>' — stage not reached
    _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "view", "{}"),
            (2, "2024-01-01 10:00:00", 1, "click", "{}"),
        ],
    )
    row = q_event_funnel(spark, str(tmp_path)).collect()[0]
    assert (row["reached_view"], row["reached_click"]) == (1, 0)


# --------------------------------------------------------- json_props_stats


def test_json_props_missing_and_malformed_keys(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "click", '{"k": 10}'),
            (2, "2024-01-01 10:01:00", 1, "click", '{"k": 30}'),
            (3, "2024-01-01 10:02:00", 1, "click", "{}"),  # no k
            (4, "2024-01-01 10:03:00", 1, "click", '{"other": 5}'),
            (5, "2024-01-01 10:04:00", 1, "view", '{"k": 7}'),
        ],
    )
    out = {
        r["event_type"]: r for r in q_json_props_stats(spark, str(tmp_path)).collect()
    }
    click = out["click"]
    assert (click["n_events"], click["n_with_k"]) == (4, 2)
    assert (click["min_k"], click["max_k"], click["sum_k"]) == (10, 30, 40)
    assert click["avg_k"] == 20.0  # avg over the 2 present, not 4
    assert out["view"]["sum_k"] == 7


# ----------------------------------------------------- behavior_fingerprint


def test_fingerprint_prefix_grouping_is_order_sensitive(spark, tmp_path):
    rows = []
    # users 1 and 2: identical 8-event opener, then user 2 diverges — SAME
    # fingerprint (prefix dedup ignores the tail)
    opener = ["view", "click", "view", "purchase", "view", "click", "error", "view"]
    for u, extra in ((1, []), (2, ["signup", "signup"])):
        for i, et in enumerate(opener + extra):
            rows.append((u * 100 + i, f"2024-01-01 10:{i:02d}:00", u, et, "{}"))
    # user 3: same MULTISET of events as the opener but reordered —
    # different fingerprint (order-sensitive, unlike set-based dedup)
    for i, et in enumerate(reversed(opener)):
        rows.append((300 + i, f"2024-01-01 10:{i:02d}:00", 3, et, "{}"))
    # user 4: only 3 events — short prefix fingerprints on what exists
    for i, et in enumerate(["view", "click", "purchase"]):
        rows.append((400 + i, f"2024-01-01 10:{i:02d}:00", 4, et, "{}"))
    _write_events(spark, tmp_path, rows)

    out = q_behavior_fingerprint(spark, str(tmp_path)).collect()
    by_opener = {r["opener"]: r for r in out}
    assert len(out) == 3
    dup = by_opener["|".join(opener)]
    assert (dup["n_users"], dup["canonical_user"]) == (2, 1)
    assert by_opener["|".join(reversed(opener))]["n_users"] == 1
    assert by_opener["view|click|purchase"]["n_users"] == 1
