"""Quality-measurement / policy operators on crafted inputs: ANN recall
with a hand-built cell assignment, IVF balance ratios, domain-cap
tiebreaks, and rate-anomaly z-scores (burst flagged, constant stream and
single-window types not).  Parity is covered by the contract gate."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from pdf_extractor_spark.queries import (
    _DOMAIN_CAP,
    q_ann_recall,
    q_domain_caps,
    q_ivf_build_stats,
    q_rate_anomaly,
)


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, [floats], label)."""
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(
        pdf, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _write_documents(spark, path, rows):
    """rows: (doc_id, source, n_chars)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    pdf["text"] = "t"
    pdf["lang"] = "en"
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    """rows: (event_id, ts_datetime, user_id, event_type)."""
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["value"] = 0.0
    pdf["props"] = "{}"
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------------ ann_recall


def test_ann_recall_counts_cell_misses(spark, tmp_path):
    # all vectors identical => cos ties, rank falls to vec_id.  Queries are
    # vec_id 0-4 (label 0).  Corpus: vec 5 label 1, vecs 6-7 label 0.
    # Exact top-5 for qid 0: {1,2,3,4,5}; in-cell top-5: {1,2,3,4,6}
    # -> 4 hits -> recall 0.8; symmetric for every qid.
    v = [0.0, 1.0]
    rows = [(i, v, 0) for i in range(5)] + [(5, v, 1), (6, v, 0), (7, v, 0)]
    _write_embeddings(spark, tmp_path, rows)
    out = {r["qid"]: r for r in q_ann_recall(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for qid, r in out.items():
        assert (r["k"], r["n_hit"], r["recall_at_5"]) == (5, 4, 0.8), qid


def test_ann_recall_perfect_when_all_one_cell(spark, tmp_path):
    v = [1.0, 0.0]
    rows = [(i, v, 0) for i in range(12)]
    _write_embeddings(spark, tmp_path, rows)
    out = q_ann_recall(spark, str(tmp_path)).collect()
    assert all(r["recall_at_5"] == 1.0 for r in out)


# ------------------------------------------------------------- ivf_build_stats


def test_ivf_build_stats_balance_ratio_and_oversized(spark, tmp_path):
    v = [1.0, 0.0]
    rows = (
        [(i, v, 0) for i in range(8)]
        + [(8, v, 1)]
        + [(9, v, 2)]
    )
    _write_embeddings(spark, tmp_path, rows)
    out = {r["label"]: r for r in q_ivf_build_stats(spark, str(tmp_path)).collect()}
    assert (out[0]["n_vecs"], out[0]["share"], out[0]["balance_ratio"]) == (8, 0.8, 2.4)
    assert out[0]["is_oversized"] is True
    assert (out[1]["share"], out[1]["balance_ratio"], out[1]["is_oversized"]) == (
        0.1, 0.3, False,
    )


# ----------------------------------------------------------------- domain_caps


def test_domain_caps_rank_tiebreak_and_cut(spark, tmp_path):
    rows = []
    # source A: cap+2 docs; two docs tie on n_chars=500 (ids 3 and 4) —
    # lower doc_id must take the better rank
    for i in range(_DOMAIN_CAP + 2):
        n = 500 if i in (3, 4) else 1000 - i
        rows.append((i, "A", n))
    # source B: 2 docs, both kept
    rows += [(900, "B", 10), (901, "B", 20)]
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q_domain_caps(spark, str(tmp_path)).collect()}
    a_ranks = sorted(
        (r["priority_rank"], d) for d, r in out.items() if r["source"] == "A"
    )
    assert len(a_ranks) == _DOMAIN_CAP + 2
    # ranks are 1..cap+2, kept iff rank <= cap
    kept_a = [d for d, r in out.items() if r["source"] == "A" and r["kept"]]
    assert len(kept_a) == _DOMAIN_CAP
    # the tie: doc 3 outranks doc 4
    assert out[3]["priority_rank"] < out[4]["priority_rank"]
    # the two longest (ids 0,1: 1000, 999) rank 1 and 2
    assert out[0]["priority_rank"] == 1 and out[1]["priority_rank"] == 2
    # the shortest two docs in A are the dropped ones (the 500-tie pair
    # sits below every 1000-i >= 938 doc): ids 3 and 4 are dropped
    assert out[3]["kept"] is False and out[4]["kept"] is False
    assert out[900]["kept"] is True and out[901]["kept"] is True


# ---------------------------------------------------------------- rate_anomaly


def test_rate_anomaly_burst_flagged_constant_not(spark, tmp_path):
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows, eid = [], 0
    # type 'burst': 19 windows of 10 events + 1 window of 100
    for w in range(20):
        n = 100 if w == 19 else 10
        for i in range(n):
            rows.append((eid, base + timedelta(seconds=300 * w + i), 1, "burst"))
            eid += 1
    # type 'flat': 10 windows of exactly 7 events
    for w in range(10):
        for i in range(7):
            rows.append((eid, base + timedelta(seconds=300 * w + i), 2, "flat"))
            eid += 1
    # type 'once': a single window (stddev_samp undefined -> z 0, no flag)
    for i in range(5):
        rows.append((eid, base + timedelta(seconds=i), 3, "once"))
        eid += 1
    _write_events(spark, tmp_path, rows)

    out = q_rate_anomaly(spark, str(tmp_path)).collect()
    burst = [r for r in out if r["event_type"] == "burst"]
    flagged = [r for r in burst if r["is_anomaly"]]
    assert len(burst) == 20
    # mean 14.5, std_samp sqrt(405) ~ 20.12 -> burst z = 85.5/20.12 ~ 4.25
    assert len(flagged) == 1 and flagged[0]["n_events"] == 100
    assert flagged[0]["z_score"] > 4
    assert all(not r["is_anomaly"] for r in out if r["event_type"] == "flat")
    assert all(r["z_score"] == 0.0 for r in out if r["event_type"] == "flat")
    once = [r for r in out if r["event_type"] == "once"]
    assert len(once) == 1 and once[0]["is_anomaly"] is False
