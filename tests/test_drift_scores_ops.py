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


# ------------------------- round-5 boundary parity (ECDF-derived deciles)


def _oracle_vs_spark(spark, tmp_path, spark_fn, oracle_sql, rows):
    """Write a crafted documents table, run the Spark query AND the DuckDB
    oracle over the same parquet, return both as sorted row tuples."""
    import duckdb

    _write_documents(spark, tmp_path, rows)
    got = spark_fn(spark, str(tmp_path)).toPandas()
    got = got.reindex(sorted(got.columns), axis=1)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = con.sql(oracle_sql).df()
    want = want.reindex(sorted(want.columns), axis=1)
    return got, want


def _assert_frames_match(got, want):
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(list(want.columns)).reset_index(drop=True)
    for c in got.columns:
        for a, b in zip(gs[c], ws[c]):
            if isinstance(a, float):
                assert a == pytest.approx(b, abs=1e-9), (c, a, b)
            else:
                assert bool(a) == bool(b) if isinstance(a, bool) else a == b, (c, a, b)


def test_psi_drift_integer_landing_deciles_match_oracle(spark, tmp_path):
    """11 reference docs make every decile position p*(N-1) = j integral
    (frac = 0, cut = an exact data value) — the ulp-sensitive landing for
    the ECDF-derived interpolation vs DuckDB's native quantile_cont."""
    from pdf_extractor_spark.queries import ORACLE_PSI_DRIFT, q_psi_drift

    # doc_id 0..13: cut c = floor(13*0.8) = 10 -> ref half = ids 0..9? no:
    # ids 0..10 (11 docs, doc_id < 10 is 10 docs) — either way positions
    # are small integers; lengths 10,20,...  so interpolated cuts can land
    # exactly on integer boundaries shared with data values.
    rows = [(i, "x" * (10 * (i + 1)), "en", "A") for i in range(14)]
    got, want = _oracle_vs_spark(
        spark, tmp_path, q_psi_drift, ORACLE_PSI_DRIFT, rows
    )
    _assert_frames_match(got, want)


def test_psi_drift_midpoint_interpolation_matches_oracle(spark, tmp_path):
    """6 reference docs -> pos = j*0.5: every odd decile interpolates
    exactly halfway between two distinct integer lengths (cut = x.0 or
    x.5), probing the lower*(hi-pos) + higher*(pos-lo) formula head-on."""
    from pdf_extractor_spark.queries import ORACLE_PSI_DRIFT, q_psi_drift

    # c = floor(7*0.8) = 5 -> ref ids 0..4 plus arrival 5..7
    rows = [(i, "x" * (10 + 10 * i), "en", "A") for i in range(8)]
    got, want = _oracle_vs_spark(
        spark, tmp_path, q_psi_drift, ORACLE_PSI_DRIFT, rows
    )
    _assert_frames_match(got, want)


def test_psi_drift_duplicate_heavy_ties_match_oracle(spark, tmp_path):
    """Massive ties: most lengths identical, so x_lo == x_hi at several
    deciles (cut must equal the tied value EXACTLY in both engines)."""
    from pdf_extractor_spark.queries import ORACLE_PSI_DRIFT, q_psi_drift

    rows = [(i, "x" * 50, "en", "A") for i in range(40)]
    rows += [(40 + i, "x" * (60 + i), "en", "A") for i in range(10)]
    got, want = _oracle_vs_spark(
        spark, tmp_path, q_psi_drift, ORACLE_PSI_DRIFT, rows
    )
    _assert_frames_match(got, want)


def test_psi_drift_empty_reference_half_defined(spark, tmp_path):
    """max(doc_id) = 0 -> c = 0 -> the reference half is EMPTY: cuts are
    NULL in both engines, every row bins to 0, and the score row is
    defined (no NaN / no crash) and engine-identical."""
    from pdf_extractor_spark.queries import ORACLE_PSI_DRIFT, q_psi_drift

    rows = [(0, "x" * 50, "en", "A")]
    got, want = _oracle_vs_spark(
        spark, tmp_path, q_psi_drift, ORACLE_PSI_DRIFT, rows
    )
    assert len(got) == 1
    assert got.iloc[0]["n_old"] == 0 and got.iloc[0]["n_new"] == 1
    _assert_frames_match(got, want)


def test_ks_drift_empty_reference_half_no_nan(spark, tmp_path):
    """ADVICE r04: a single doc (max(doc_id)=0) used to yield 0.0/0.0 =
    NaN; the greatest(n,1) guard must produce a defined, engine-identical
    row (ks_d = the full arrival ECDF = 1.0, drifted false vs the
    infinite threshold)."""
    from pdf_extractor_spark.queries import ORACLE_KS_DRIFT, q_ks_drift

    rows = [(0, "x" * 50, "en", "A")]
    got, want = _oracle_vs_spark(
        spark, tmp_path, q_ks_drift, ORACLE_KS_DRIFT, rows
    )
    row = got.iloc[0]
    assert not math.isnan(row["ks_d"])
    assert row["ks_d"] == 1.0 and row["n_old"] == 0 and row["n_new"] == 1
    assert not bool(row["drifted"])
    _assert_frames_match(got, want)


def test_dup_group_report_null_text_both_spellings_agree(spark, tmp_path):
    """ADVICE r04: NULL text must count as copies of the empty digest in
    BOTH formulations (window groups NULLs together; the oracle join-back
    dropped them before the coalesce)."""
    import duckdb

    from pdf_extractor_spark.queries import (
        ORACLE_DUP_GROUP_REPORT,
        q_dup_group_report,
    )

    pdf = pd.DataFrame(
        [
            (0, None, "en", "A"),
            (1, None, "de", "B"),
            (2, "hello", "en", "A"),
            (3, "hello", "en", "A"),
            (4, "solo", "en", "B"),
        ],
        columns=["doc_id", "text", "lang", "source"],
    )
    pdf["n_chars"] = pdf["text"].str.len().fillna(0).astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = q_dup_group_report(spark, str(tmp_path)).toPandas()
    got = got.reindex(sorted(got.columns), axis=1)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = con.sql(ORACLE_DUP_GROUP_REPORT).df()
    want = want.reindex(sorted(want.columns), axis=1)
    _assert_frames_match(got, want)
    # the two NULL-text docs are one duplicate group straddling sources
    # AND langs — n_docs must include them (the join-back used to drop them)
    a = got.set_index("source").loc["A"]
    b = got.set_index("source").loc["B"]
    assert a["n_docs"] == 3 and b["n_docs"] == 2
    assert b["n_mirror_docs"] == 1 and b["n_mislabel_docs"] == 1
