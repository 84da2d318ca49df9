"""Round-5 batch-26 operators on crafted inputs, verified against
independent Python computations: t_closeness (total-variation distance
per QI cell incl. absent-type mass), dp_count_error_planning (Laplace
scale / relative error against measured group sizes)."""

from __future__ import annotations

import datetime as dt

from pdf_extractor_spark.queries import (
    _DP_EPSILONS,
    _T_CLOSENESS,
    q_dp_count_error_planning,
    q_t_closeness,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, 1, et, v, "{}") for i, (ts, et, v) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _at(hour: int, sec: int = 0) -> dt.datetime:
    return _EPOCH + dt.timedelta(hours=hour, seconds=sec)


# ------------------------------------------------------------ t_closeness


def test_tvd_uniform_cells_have_zero_distance(spark, tmp_path):
    # Both cells (hour 0 / hour 1, same band) carry the global 50/50
    # view/click mix -> TVD 0 everywhere, nothing above t.
    rows = [(_at(0, 0), "view", 1.0), (_at(0, 1), "click", 1.0),
            (_at(1, 0), "view", 1.0), (_at(1, 1), "click", 1.0)]
    _write_events(spark, tmp_path, rows)
    r = q_t_closeness(spark, str(tmp_path)).collect()[0]
    assert (r["n_cells"], r["n_rows"]) == (2, 4)
    assert r["max_tvd"] == 0.0 and r["avg_tvd"] == 0.0
    assert r["cells_above_t"] == 0 and r["rows_above_t"] == 0
    assert r["risk_rate"] == 0.0


def test_tvd_counts_absent_type_mass(spark, tmp_path):
    # Global mix over 4 events: 3 view, 1 error -> pg = (.75, .25).
    # Cell hour0 = 3 view only: TVD = (|1-.75| + .25)/2 = .25 (the
    # absent 'error' mass must be counted or this halves to .125).
    # Cell hour1 = 1 error only: TVD = (|1-.25| + .75)/2 = .75.
    rows = [(_at(0, 0), "view", 1.0), (_at(0, 1), "view", 1.0),
            (_at(0, 2), "view", 1.0), (_at(1, 0), "error", 1.0)]
    _write_events(spark, tmp_path, rows)
    r = q_t_closeness(spark, str(tmp_path)).collect()[0]
    assert (r["n_cells"], r["n_rows"]) == (2, 4)
    assert r["max_tvd"] == 0.75
    assert r["avg_tvd"] == 0.5
    # t = 0.2 -> both cells violate; all 4 rows at risk
    assert _T_CLOSENESS == 0.2
    assert r["cells_above_t"] == 2
    assert r["rows_above_t"] == 4
    assert r["risk_rate"] == 1.0


def test_value_band_is_part_of_the_quasi_identifier(spark, tmp_path):
    # Same hour, values 5 and 15 -> two bands -> two cells.
    rows = [(_at(0, 0), "view", 5.0), (_at(0, 1), "view", 15.0)]
    _write_events(spark, tmp_path, rows)
    r = q_t_closeness(spark, str(tmp_path)).collect()[0]
    assert r["n_cells"] == 2
    # single event type everywhere -> every cell matches global exactly
    assert r["max_tvd"] == 0.0


# ------------------------------------------------------- dp_count_error_planning


def test_laplace_scale_and_rel_error_grid(spark, tmp_path):
    # sources: a=200 docs (eps=1.0 within 1%: 1/200=.005; eps=.1 not:
    # 10/200=.05), b=4 docs (never within 1%).
    rows = [("a", f"t{i}") for i in range(200)] + [("b", f"u{i}") for i in range(4)]
    _write_docs(spark, tmp_path, rows)
    out = {(r["source"], r["epsilon"]): r
           for r in q_dp_count_error_planning(spark, str(tmp_path)).collect()}
    assert set(out) == {(s, e) for s in ("a", "b") for e in _DP_EPSILONS}
    for (s, e), r in out.items():
        n = 200 if s == "a" else 4
        assert r["n_docs"] == n
        assert r["laplace_scale"] == round(1.0 / e, 4)
        assert r["expected_rel_error"] == round(1.0 / e / n, 6)
        assert r["within_1pct"] == (1.0 / e / n <= 0.01)
    assert out[("a", 1.0)]["within_1pct"] is True
    assert out[("a", 0.1)]["within_1pct"] is False
    assert out[("b", 1.0)]["within_1pct"] is False


def test_output_ordered_by_source_then_epsilon(spark, tmp_path):
    _write_docs(spark, tmp_path, [("b", "x"), ("a", "y")])
    got = [(r["source"], r["epsilon"])
           for r in q_dp_count_error_planning(spark, str(tmp_path)).collect()]
    assert got == sorted(got)
