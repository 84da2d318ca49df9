"""Governance + graph operators on crafted inputs: k-anonymity cell
audit, unrolled damped PageRank with dangling-mass redistribution,
per-doc n-gram novelty, pairwise source vocabulary overlap.  Parity is
covered by the contract gate; these pin SEMANTICS small enough to verify
by hand."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    q_k_anonymity,
    q_ngram_novelty,
    q_pagerank_events,
    q_source_vocab_overlap,
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


# -------------------------------------------------------------- k_anonymity


def test_k_anonymity_flags_small_user_cells(spark, tmp_path):
    rows = []
    eid = 0
    # cell (A, hour 10, band 0): 10 rows spread over 6 users -> k=6, safe
    for i in range(10):
        eid += 1
        rows.append((eid, f"2024-01-01T10:{i:02d}:00", i % 6, "A", 5.0))
    # cell (A, hour 11, band 0): 3 rows over 2 users -> k=2, at risk
    for i in range(3):
        eid += 1
        rows.append((eid, f"2024-01-01T11:{i:02d}:00", 100 + i % 2, "A", 5.0))
    _write_events(spark, tmp_path, rows)
    out = q_k_anonymity(spark, str(tmp_path)).toPandas().set_index("event_type")
    a = out.loc["A"]
    assert a["n_cells"] == 2 and a["n_rows"] == 13
    assert a["min_k"] == 2
    assert a["cells_below_k"] == 1
    assert a["rows_at_risk"] == 3
    assert a["risk_rate"] == pytest.approx(round(3 / 13, 4))


def test_k_anonymity_value_band_splits_cells(spark, tmp_path):
    # same type+hour but values 5.0 vs 95.0 land in different bands, so the
    # 5 users do NOT pool: each band has k=5 ... make one band k=1
    rows = [(i, "2024-01-01T10:00:00", i, "A", 5.0) for i in range(5)]
    rows.append((99, "2024-01-01T10:30:00", 42, "A", 95.0))
    _write_events(spark, tmp_path, rows)
    out = q_k_anonymity(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["n_cells"] == 2
    assert out["min_k"] == 1
    assert out["rows_at_risk"] == 1  # only the lone 95.0 row


# ---------------------------------------------------------- pagerank_events


def test_pagerank_two_node_hand_computed(spark, tmp_path):
    # two users each emit A -> B: one edge A->B with weight 1; B dangles.
    rows = [
        (1, "2024-01-01T10:00:00", 1, "A", 1.0),
        (2, "2024-01-01T10:01:00", 1, "B", 1.0),
        (3, "2024-01-01T10:00:00", 2, "A", 1.0),
        (4, "2024-01-01T10:01:00", 2, "B", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = (
        q_pagerank_events(spark, str(tmp_path))
        .toPandas()
        .set_index("event_type")
    )
    # hand-unrolled 3 iterations (d=0.85, N=2, B's mass redistributes):
    # r1=(0.2875, 0.7125) r2=(0.3778125, 0.6221875) r3=(0.33943, 0.66057)
    assert out.loc["A", "pagerank"] == pytest.approx(0.3394)
    assert out.loc["B", "pagerank"] == pytest.approx(0.6606)
    assert out.loc["B", "rank_pos"] == 1 and out.loc["A", "rank_pos"] == 2
    assert bool(out.loc["A", "has_out"]) and not bool(out.loc["B", "has_out"])


def test_pagerank_mass_conserved_on_real_table(spark):
    out = q_pagerank_events(spark, "/root/testdata/sf0.001").toPandas()
    # dangling redistribution keeps total rank at 1.0 (up to round(4) noise)
    assert out["pagerank"].sum() == pytest.approx(1.0, abs=5e-4)
    assert (out["pagerank"] > 0).all()
    # rank_pos is a permutation of 1..N
    assert sorted(out["rank_pos"]) == list(range(1, len(out) + 1))


# ------------------------------------------------------------ ngram_novelty


def test_ngram_novelty_first_copy_late_copy(spark, tmp_path):
    rows = [
        (0, "a b c d", "en", "web"),    # grams {a b c, b c d}: both novel
        (1, "a b c d", "en", "web"),    # exact copy: nothing novel
        (2, "a b c x", "en", "web"),    # {a b c(seen), b c x(new)}: 0.5
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_ngram_novelty(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert out.loc[0, "novelty_rate"] == 1.0 and out.loc[0, "n_grams"] == 2
    assert out.loc[1, "novelty_rate"] == 0.0
    assert out.loc[2, "novelty_rate"] == 0.5 and out.loc[2, "n_novel"] == 1


def test_ngram_novelty_counts_distinct_grams_once(spark, tmp_path):
    # "a b a b a b" -> grams [a b a, b a b, a b a, b a b] = 2 DISTINCT
    _write_documents_sources(spark, tmp_path, [(0, "a b a b a b", "en", "w")])
    out = q_ngram_novelty(spark, str(tmp_path)).toPandas()
    assert out.iloc[0]["n_grams"] == 2
    assert out.iloc[0]["novelty_rate"] == 1.0


# ------------------------------------------------------ source_vocab_overlap


def test_source_vocab_overlap_jaccard_and_containment(spark, tmp_path):
    rows = [
        (0, "x y z", "en", "A"),
        (1, "x y", "en", "B"),
        (2, "q", "en", "C"),
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_source_vocab_overlap(spark, str(tmp_path)).toPandas()
    pairs = {(r.source_a, r.source_b): r for r in out.itertuples()}
    ab = pairs[("A", "B")]
    assert ab.n_shared == 2 and ab.vocab_a == 3 and ab.vocab_b == 2
    assert ab.jaccard == pytest.approx(round(2 / 3, 4))
    assert ab.containment == 1.0  # B's vocab is fully inside A's
    # zero-overlap pairs don't materialize rows
    assert ("A", "C") not in pairs and ("B", "C") not in pairs


def test_source_vocab_overlap_dedups_token_occurrences(spark, tmp_path):
    # repeated tokens must not inflate the intersection count
    rows = [
        (0, "x x x y", "en", "A"),
        (1, "x x", "en", "B"),
    ]
    _write_documents_sources(spark, tmp_path, rows)
    out = q_source_vocab_overlap(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["n_shared"] == 1 and out["vocab_a"] == 2 and out["vocab_b"] == 1
