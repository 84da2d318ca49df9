"""Round-5 batch-21 operators on crafted inputs with hand-computed
expectations: hill_tail_index (tail-index algebra + degenerate guard),
eb_shrunken_brand_means (exact James-Stein weights), slo_burn_rate
(multiwindow burn thresholds incl. the two-window AND)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    q_eb_shrunken_brand_means,
    q_hill_tail_index,
    q_slo_burn_rate,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _docs(spark, path, lengths):
    spark.createDataFrame(
        [(i, "x" * 3, "en", "s", n) for i, n in enumerate(lengths)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------------- hill_tail_index


def test_hill_alpha_exact(spark, tmp_path):
    lengths = [100, 200, 400, 800]
    _docs(spark, tmp_path, lengths)
    row = q_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert (row["k_tail"], row["cutoff_chars"], row["max_chars"]) == (
        4, 100, 800)
    alpha = 1.0 / (sum(math.log(x) for x in lengths) / 4 - math.log(100))
    assert row["hill_alpha"] == round(alpha, 4)
    assert row["finite_variance"] is False  # alpha ~0.96 <= 2


def test_hill_degenerate_equal_lengths(spark, tmp_path):
    _docs(spark, tmp_path, [100, 100, 100])
    row = q_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert row["hill_alpha"] is None  # zero log-spread -> guarded NULL


# ----------------------------------------------------- eb_shrunken_brand_means


def test_eb_shrinkage_exact_weights(spark, tmp_path):
    parts = [("A", 10.0), ("A", 14.0), ("B", 20.0), ("B", 24.0)]
    spark.createDataFrame(
        [(i, b, p) for i, (b, p) in enumerate(parts)],
        "p_partkey bigint, p_brand string, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    out = {r["p_brand"]: r
           for r in q_eb_shrunken_brand_means(spark, str(tmp_path)).collect()}
    # means 12/22, grand 17; s2w = 8, var_means = 25, tau2 = 25-8*.5 = 21
    # weight = 21/(21+8/2) = 0.84; shrunk = 17 +/- 5*0.84
    a, b = out["A"], out["B"]
    assert (a["n_parts"], a["raw_mean"]) == (2, 12.0)
    assert a["shrink_weight"] == 0.84 and a["shrunk_mean"] == 12.8
    assert (b["raw_mean"], b["shrunk_mean"]) == (22.0, 21.2)


def test_eb_zero_within_variance_keeps_raw_means(spark, tmp_path):
    parts = [("A", 10.0), ("A", 10.0), ("B", 20.0), ("B", 20.0),
             ("C", 30.0), ("C", 30.0)]
    spark.createDataFrame(
        [(i, b, p) for i, (b, p) in enumerate(parts)],
        "p_partkey bigint, p_brand string, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    out = {r["p_brand"]: r
           for r in q_eb_shrunken_brand_means(spark, str(tmp_path)).collect()}
    for brand, mean in (("A", 10.0), ("B", 20.0), ("C", 30.0)):
        assert out[brand]["shrink_weight"] == 1.0
        assert out[brand]["shrunk_mean"] == mean


# ---------------------------------------------------------------- slo_burn_rate


def test_slo_multiwindow_and_gate(spark, tmp_path):
    rows, eid = [], 0
    bad_by_hour = {6: 6, 7: 8}
    for h in range(8):
        bad = bad_by_hour.get(h, 0)
        for i in range(10):
            eid += 1
            typ = "error" if i < bad else "view"
            rows.append((eid, _EPOCH + dt.timedelta(seconds=h * 3600 + i),
                         1, typ, 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["hour"] % 24: r for r in q_slo_burn_rate(spark, str(tmp_path)).collect()}
    assert out[0]["error_ratio_6h"] == 0.0 and out[0]["page_flag"] is False
    h6 = out[6]
    # fast window burns 3x but the slow window is only at 0.5 -> no page
    assert (h6["error_ratio_1h"], h6["burn_1h"]) == (0.6, 3.0)
    assert (h6["error_ratio_6h"], h6["burn_6h"]) == (0.1, 0.5)
    assert h6["page_flag"] is False
    h7 = out[7]
    # both windows over budget -> page
    assert (h7["burn_1h"], h7["burn_6h"]) == (4.0, 1.1667)
    assert h7["page_flag"] is True
