"""Round-5 batch-23 operators on crafted inputs, verified against
independent Python computations: periodogram_probe (spectral power at a
planted 24h cycle), overdispersion_check (under/over-dispersed count
moments), capture_recapture_users (Lincoln-Petersen/Chapman vs truth)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _PERIODS_H,
    q_capture_recapture_users,
    q_overdispersion_check,
    q_periodogram_probe,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, ts, u, t in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------ periodogram_probe


def test_periodogram_planted_24h_cycle(spark, tmp_path):
    counts = [20 + round(10 * math.cos(2 * math.pi * h / 24))
              for h in range(48)]
    rows, eid = [], 0
    for h, n in enumerate(counts):
        for i in range(n):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=h * 3600 + i),
                         1, "view"))
    _write_events(spark, tmp_path, rows)
    out = {r["period_hours"]: r
           for r in q_periodogram_probe(spark, str(tmp_path)).collect()}
    assert set(out) == set(_PERIODS_H)
    # replicate the estimator independently
    mean = sum(counts) / len(counts)
    xs = [c - mean for c in counts]
    sxx = sum(x * x for x in xs)
    for t in _PERIODS_H:
        cos_s = sum(x * math.cos(2 * math.pi * h / t)
                    for h, x in enumerate(xs))
        sin_s = sum(x * math.sin(2 * math.pi * h / t)
                    for h, x in enumerate(xs))
        power = cos_s**2 + sin_s**2
        assert out[t]["raw_power"] == round(power, 2)
        assert out[t]["normalized_power"] == round(
            power / (len(xs) * sxx), 4)
    # the planted cycle dominates every other candidate
    assert all(out[24]["normalized_power"] > out[t]["normalized_power"]
               for t in _PERIODS_H if t != 24)


# --------------------------------------------------------- overdispersion_check


def test_dispersion_index_and_nb_size(spark, tmp_path):
    rows, eid = [], 0
    for uid, n in ((1, 1), (2, 2), (3, 3)):           # type A: var < mean
        for _ in range(n):
            eid += 1
            rows.append((eid, _wk(0, eid), uid, "A"))
    for uid, n in ((1, 1), (2, 5)):                    # type B: var > mean
        for _ in range(n):
            eid += 1
            rows.append((eid, _wk(0, eid), uid, "B"))
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r
           for r in q_overdispersion_check(spark, str(tmp_path)).collect()}
    a, b = out["A"], out["B"]
    assert (a["n_active_users"], a["mean_per_user"], a["var_per_user"]) == (
        3, 2.0, 1.0)
    assert a["dispersion_index"] == 0.5
    assert a["nb_size_r"] == -4.0  # m^2/(s2-m) = 4/-1: underdispersed
    assert a["overdispersed"] is False
    assert (b["mean_per_user"], b["var_per_user"]) == (3.0, 8.0)
    assert b["dispersion_index"] == 2.6667
    assert b["nb_size_r"] == 1.8
    assert b["overdispersed"] is True
    assert b["dispersion_z"] == round((8 / 3 - 1) * math.sqrt(0.5), 4)


# ----------------------------------------------------- capture_recapture_users


def test_chapman_vs_measured_truth(spark, tmp_path):
    rows, eid = [], 0
    for uid in (1, 2, 3, 4):           # week A captures
        eid += 1
        rows.append((eid, _wk(0, eid), uid, "view"))
    for uid in (3, 4, 5):              # week B captures (overlap 3,4)
        eid += 1
        rows.append((eid, _wk(1, eid), uid, "view"))
    eid += 1
    rows.append((eid, _wk(2), 9, "view"))  # later week: truth only
    _write_events(spark, tmp_path, rows)
    row = q_capture_recapture_users(spark, str(tmp_path)).collect()[0]
    assert (row["n_week_a"], row["n_week_b"], row["n_both"]) == (4, 3, 2)
    assert row["lincoln_petersen"] == 6.0
    assert row["chapman"] == round(5 * 4 / 3 - 1, 2)
    assert row["observed_two_week"] == 5
    assert row["observed_all_time"] == 6
    assert row["chapman_coverage_of_truth"] == round(
        (5 * 4 / 3 - 1) / 6, 4)
