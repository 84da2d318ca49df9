"""Round-5 batch-25 operators on crafted inputs, verified against
independent Python computations: mde_planning_curve (power formula on
measured variance/traffic), median_ci_binomial (order-statistic CI
bounds), extreme_value_load (Gumbel moments and return levels)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _EULER_GAMMA,
    _MDE_HORIZONS,
    q_extreme_value_load,
    q_mde_planning_curve,
    q_median_ci_binomial,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, u, "view", v, "{}") for i, ts, u, v in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------ mde_planning_curve


def test_mde_formula_on_known_moments(spark, tmp_path):
    # grid: 2 weeks x 2 users, values [1,3,1,3] -> mu=2, s2=4/3, rate=2/wk
    rows = [(1, _wk(0), 1, 1.0), (2, _wk(0), 2, 3.0),
            (3, _wk(1), 1, 1.0), (4, _wk(1), 2, 3.0)]
    _write_events(spark, tmp_path, rows)
    out = {r["horizon_weeks"]: r
           for r in q_mde_planning_curve(spark, str(tmp_path)).collect()}
    assert set(out) == set(_MDE_HORIZONS)
    s2 = 4.0 / 3
    for h in _MDE_HORIZONS:
        n_arm = 2.0 * h / 2
        mde = 2.8016 * math.sqrt(2 * s2 / n_arm)
        r = out[h]
        assert r["users_per_arm"] == round(n_arm)
        assert r["weekly_mean"] == 2.0
        assert r["mde_abs"] == round(mde, 4)
        assert r["mde_rel"] == round(mde / 2.0, 4)
    # longer horizons always buy smaller MDEs
    assert out[8]["mde_abs"] < out[1]["mde_abs"]


# ------------------------------------------------------------ median_ci_binomial


def test_median_ci_order_statistics(spark, tmp_path):
    spark.createDataFrame(
        [(i, "x", "en", "s", i) for i in range(1, 101)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = q_median_ci_binomial(spark, str(tmp_path)).collect()[0]
    assert row["n_docs"] == 100
    assert row["median"] == 50              # cum >= ceil(100/2)
    assert row["ci_lo"] == 40               # floor((100 - 19.6)/2) = 40
    assert row["ci_hi"] == 61               # ceil((100 + 19.6)/2) + 1 = 61
    assert row["ci_lo"] < row["median"] < row["ci_hi"]


# ------------------------------------------------------------ extreme_value_load


def test_gumbel_moments_and_return_levels(spark, tmp_path):
    rows, eid = [], 0
    # day d peak = 10/20/30 at its first hour; one stray event later in
    # the day so the daily max is unambiguous
    for d, peak in enumerate((10, 20, 30)):
        for i in range(peak):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=d * 86400 + i),
                         1, 0.0))
        eid += 1
        rows.append((eid, _EPOCH + dt.timedelta(seconds=d * 86400 + 7200),
                     1, 0.0))
    _write_events(spark, tmp_path, rows)
    row = q_extreme_value_load(spark, str(tmp_path)).collect()[0]
    assert (row["n_days"], row["daily_peak_mean"], row["daily_peak_sd"]) == (
        3, 20.0, 10.0)
    beta = 10.0 * math.sqrt(6.0) / math.pi
    mu = 20.0 - _EULER_GAMMA * beta
    assert row["gumbel_beta"] == round(beta, 2)
    assert row["gumbel_mu"] == round(mu, 2)
    assert row["observed_max"] == 30
    for t, col in ((30, "return_level_30d"), (365, "return_level_365d")):
        rl = mu - beta * math.log(-math.log(1.0 - 1.0 / t))
        assert row[col] == round(rl, 2)
    assert row["return_level_365d"] > row["return_level_30d"]
