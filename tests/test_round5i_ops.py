"""Round-5 batch-18 operators on crafted inputs with hand-computed
expectations: srm_check (sample-ratio-mismatch z-test on the md5 arm
split), mean_shift_decomposition (Oaxaca mix/within attribution summing
exactly to the total delta), anova_variance_decomposition (one-way
between/within variance split)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pdf_extractor_spark.queries import (
    q_anova_variance_decomposition,
    q_mean_shift_decomposition,
    q_srm_check,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


def _arm(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2


# --------------------------------------------------------------------- srm_check


def test_srm_z_and_flag(spark, tmp_path):
    week0_users = list(range(1, 7))
    # week 1: 30 users hand-picked to all land in arm 0 -> guaranteed SRM
    week1_users = [u for u in range(100, 1000) if _arm(u) == 0][:30]
    rows = [(i, _wk(0), u) for i, u in enumerate(week0_users)]
    rows += [(100 + i, _wk(1), u) for i, u in enumerate(week1_users)]
    spark.createDataFrame(
        [(i, ts, u, "view", 0.0, "{}") for i, ts, u in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["week"] - _BASE_WEEK: r
           for r in q_srm_check(spark, str(tmp_path)).collect()}
    n_a0 = sum(1 for u in week0_users if _arm(u) == 0)
    n_b0 = 6 - n_a0
    assert (out[0]["n_a"], out[0]["n_b"]) == (n_a0, n_b0)
    assert out[0]["z_score"] == round((n_a0 - n_b0) / math.sqrt(6), 4)
    assert (out[1]["n_a"], out[1]["n_b"]) == (30, 0)
    assert out[1]["z_score"] == round(30 / math.sqrt(30), 4)
    assert out[1]["srm_flag"] is True and out[0]["srm_flag"] is False


# ------------------------------------------------- mean_shift_decomposition


def test_mean_shift_identity(spark, tmp_path):
    early = dt.datetime(1997, 1, 1)
    late = dt.datetime(1999, 1, 1)
    rows = [
        ("P1", early, 100.0), ("P1", early, 100.0),
        ("P2", early, 200.0), ("P2", early, 200.0),
        ("P1", late, 100.0),
        ("P2", late, 300.0), ("P2", late, 300.0), ("P2", late, 300.0),
    ]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_orderdate timestamp,"
        " o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r["o_orderpriority"]: r
           for r in q_mean_shift_decomposition(spark, str(tmp_path)).collect()}
    p1, p2 = out["P1"], out["P2"]
    assert (p1["n_early"], p1["n_late"], p1["mean_early"], p1["mean_late"],
            p1["share_early"], p1["share_late"]) == (2, 1, 100.0, 100.0,
                                                     0.5, 0.25)
    assert (p1["mix_contrib"], p1["within_contrib"]) == (-25.0, 0.0)
    assert (p2["mix_contrib"], p2["within_contrib"]) == (50.0, 75.0)
    # the decomposition sums exactly to the reported total delta
    assert p1["total_delta"] == p2["total_delta"] == 100.0
    assert sum(r["mix_contrib"] + r["within_contrib"]
               for r in out.values()) == 100.0


# --------------------------------------------- anova_variance_decomposition


def test_anova_exact_decomposition(spark, tmp_path):
    docs = [("a", 10), ("a", 20), ("b", 30), ("b", 40)]
    spark.createDataFrame(
        [(i, "x", "en", s, n) for i, (s, n) in enumerate(docs)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = q_anova_variance_decomposition(spark, str(tmp_path)).collect()[0]
    # values [10,20,30,40]: SST=500, SSW=100 (25x4 within), SSB=400
    assert (row["n_rows"], row["n_groups"]) == (4, 2)
    assert row["var_total"] == 125.0
    assert row["var_within"] == 25.0
    assert row["var_between"] == 100.0
    assert row["eta_squared"] == 0.8
    assert row["f_stat"] == 8.0  # (400/1) / (100/2)
