"""Round-5 batch-20 operators on crafted inputs with hand-computed
expectations: cuped_variance_reduction (perfect-covariate degenerate
case), ratio_metric_delta_ci (zero-variance and exact delta-method
arms), event_trigram_motifs (positional trigram census)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pdf_extractor_spark.queries import (
    q_cuped_variance_reduction,
    q_event_trigram_motifs,
    q_ratio_metric_delta_ci,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


def _arm(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------- cuped_variance_reduction


def test_cuped_perfect_covariate(spark, tmp_path):
    # post value is exactly 2x the pre value per user -> theta 2,
    # CUPED variance 0, reduction share 1
    rows, eid = [], 0
    for i, x in enumerate((1.0, 2.0, 3.0, 4.0), start=1):
        eid += 1
        rows.append((eid, _wk(0), i, "view", x))        # pre (week 0 < cut)
        eid += 1
        rows.append((eid, _wk(3), i, "view", 2 * x))    # post (week 3 >= cut)
    _write_events(spark, tmp_path, rows)
    row = q_cuped_variance_reduction(spark, str(tmp_path)).collect()[0]
    assert row["n_users"] == 4
    assert row["theta"] == 2.0
    assert row["var_raw"] == 5.0      # population var of [2,4,6,8]
    assert row["var_cuped"] == 0.0
    assert row["var_reduction_share"] == 1.0


# ----------------------------------------------------- ratio_metric_delta_ci


def test_delta_ci_zero_and_exact_variance(spark, tmp_path):
    arm0 = [u for u in range(1, 200) if _arm(u) == 0][:3]
    arm1 = [u for u in range(1, 200) if _arm(u) == 1][:2]
    rows, eid = [], 0

    def add(uid, n_clicks, n_views):
        nonlocal eid
        for _ in range(n_clicks):
            eid += 1
            rows.append((eid, _wk(0, eid), uid, "click", 0.0))
        for _ in range(n_views):
            eid += 1
            rows.append((eid, _wk(0, eid), uid, "view", 0.0))

    # arm 0: every user clicks exactly half their views -> se = 0
    for uid, (c, v) in zip(arm0, ((1, 2), (2, 4), (3, 6))):
        add(uid, c, v)
    # arm 1: (1 click, 1 view) and (0 clicks, 1 view) -> R=.5, se=.5
    add(arm1[0], 1, 1)
    add(arm1[1], 0, 1)
    _write_events(spark, tmp_path, rows)
    out = {r["arm"]: r
           for r in q_ratio_metric_delta_ci(spark, str(tmp_path)).collect()}
    a0, a1 = out[0], out[1]
    assert (a0["n_users"], a0["clicks"], a0["views"]) == (3, 6, 12)
    assert (a0["ratio"], a0["se"], a0["ci_lo"], a0["ci_hi"]) == (
        0.5, 0.0, 0.5, 0.5)
    assert (a1["n_users"], a1["clicks"], a1["views"]) == (2, 1, 2)
    assert (a1["ratio"], a1["se"]) == (0.5, 0.5)
    assert (a1["ci_lo"], a1["ci_hi"]) == (-0.48, 1.48)


# ------------------------------------------------------ event_trigram_motifs


def test_trigram_motifs_counts_and_ranking(spark, tmp_path):
    rows, eid = [], 0

    def seq(uid, types):
        nonlocal eid
        for i, t in enumerate(types):
            eid += 1
            rows.append((eid, _wk(0, 100 * uid + i), uid, t, 0.0))

    seq(1, ["view", "click", "purchase", "view"])
    seq(2, ["error", "error", "error", "error"])
    _write_events(spark, tmp_path, rows)
    out = q_event_trigram_motifs(spark, str(tmp_path)).collect()
    assert [(r["motif"], r["n"], r["motif_share"]) for r in out] == [
        ("error>error>error", 2, 0.5),
        ("click>purchase>view", 1, 0.25),
        ("view>click>purchase", 1, 0.25),
    ]
