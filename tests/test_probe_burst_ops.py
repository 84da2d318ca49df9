"""Probe-gain recall curve + Fano burstiness on crafted inputs."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.queries import q_ann_recall_multiprobe, q_burstiness


def _write_embeddings(spark, path, triples):
    """triples: (vec_id, [floats], label)."""
    rows = [(i, [float(x) for x in v], int(l)) for i, v, l in triples]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


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


def test_ann_recall_multiprobe_second_probe_buys_recall(spark, tmp_path):
    # query [1,0]; exact top-5 = two label-0, two label-1, one label-2 vec;
    # probing cell 1 catches 2/5, probing two cells catches 4/5
    _write_embeddings(
        spark, tmp_path,
        [
            (0, [1.0, 0.0], 0),        # the query
            (10, [1.0, 0.01], 0),
            (11, [1.0, 0.02], 0),
            (12, [1.0, 0.03], 1),
            (13, [1.0, 0.04], 1),
            (14, [0.9, 0.1], 2),
            (15, [0.0, 1.0], 3),       # far filler
            (16, [-1.0, 0.0], 3),      # far filler
        ],
    )
    out = q_ann_recall_multiprobe(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["k"] == 5
    assert out["recall_p1"] == pytest.approx(0.4)
    assert out["recall_p2"] == pytest.approx(0.8)


def test_ann_recall_multiprobe_single_cell_is_perfect(spark, tmp_path):
    # everything relevant in one cell: both probes hit 1.0 and the curve
    # is flat (the "second probe buys nothing" verdict)
    _write_embeddings(
        spark, tmp_path,
        [(0, [1.0, 0.0], 0)]
        + [(10 + i, [1.0, 0.01 * (i + 1)], 0) for i in range(5)]
        + [(20, [0.0, 1.0], 1)],
    )
    out = q_ann_recall_multiprobe(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["recall_p1"] == 1.0 and out["recall_p2"] == 1.0


def test_burstiness_flat_vs_alternating(spark, tmp_path):
    rows = []
    eid = 0
    for hour in range(12):
        for i in range(5):  # flat: 5/hour, variance 0
            eid += 1
            rows.append((eid, f"2024-01-01T{hour:02d}:{i:02d}:00", 1, "flat", 1.0))
        n = 1 if hour % 2 == 0 else 19  # bursty: mean 10, huge variance
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-01-01T{hour:02d}:{i:02d}:30", 2, "burst", 1.0))
    _write_events(spark, tmp_path, rows)
    out = q_burstiness(spark, str(tmp_path)).toPandas().set_index("event_type")
    flat = out.loc["flat"]
    assert flat["fano_factor"] == 0.0 and not bool(flat["is_bursty"])
    burst = out.loc["burst"]
    assert burst["mean_per_hour"] == pytest.approx(10.0)
    # var = 12 * 81 / 11
    assert burst["var_per_hour"] == pytest.approx(round(12 * 81 / 11, 4))
    assert burst["fano_factor"] == pytest.approx(round(12 * 81 / 11 / 10, 4))
    assert bool(burst["is_bursty"])


def test_burstiness_single_hour_degrades_to_zero(spark, tmp_path):
    rows = [(i, "2024-01-01T10:00:00", 1, "once", 1.0) for i in range(7)]
    _write_events(spark, tmp_path, rows)
    out = q_burstiness(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["n_hours"] == 1
    assert out["fano_factor"] == 0.0 and not bool(out["is_bursty"])


def _write_documents_sl(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_dup_group_report_provenance_flags(spark, tmp_path):
    from pdf_extractor_spark.queries import q_dup_group_report

    rows = [
        (0, "mirrored page", "en", "siteA"),   # cross-source pair
        (1, "mirrored page", "en", "siteB"),
        (2, "mislabeled", "en", "siteA"),      # cross-lang pair, same source
        (3, "mislabeled", "fr", "siteA"),
        (4, "same-site dup", "en", "siteA"),   # neither flag
        (5, "same-site dup", "en", "siteA"),
        (6, "unique text", "en", "siteA"),     # singleton: no row
    ]
    _write_documents_sl(spark, tmp_path, rows)
    out = q_dup_group_report(spark, str(tmp_path)).toPandas().set_index("source")
    a, b = out.loc["siteA"], out.loc["siteB"]
    # siteA: 6 docs; dup docs = mirrored(1) + mislabeled(2) + same-site(2)
    assert a["n_docs"] == 6 and a["n_dup_docs"] == 5
    assert a["n_mirror_docs"] == 1      # its half of the cross-source pair
    assert a["n_mislabel_docs"] == 2    # both mislabeled copies live here
    assert a["dup_rate"] == pytest.approx(round(5 / 6, 4))
    # siteB: its only doc is the other half of the mirror
    assert b["n_docs"] == 1 and b["n_dup_docs"] == 1
    assert b["n_mirror_docs"] == 1 and b["n_mislabel_docs"] == 0
