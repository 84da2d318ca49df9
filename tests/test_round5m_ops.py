"""Round-5 batch-22 operators on crafted inputs, verified against
independent Python computations: did_aa_validation (two-sample DiD
algebra), bh_discovery_scan (Zelen-Severo p-values + BH step-up),
mann_whitney_lengths (histogram-based U with tie correction)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pdf_extractor_spark.queries import (
    q_bh_discovery_scan,
    q_did_aa_validation,
    q_mann_whitney_lengths,
)

_EPOCH = dt.datetime(1970, 1, 1)
_BASE_WEEK = 2800


def _wk(w: int, off_s: int = 3600) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=(_BASE_WEEK + w) * 604800 + off_s)


def _arm(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2


def _norm_tail_p(z: float) -> float:
    k = 1.0 / (1.0 + 0.2316419 * abs(z))
    poly = (0.319381530 * k - 0.356563782 * k**2 + 1.781477937 * k**3
            - 1.821255978 * k**4 + 1.330274429 * k**5)
    return 2.0 * math.exp(-abs(z) * abs(z) / 2.0) / math.sqrt(2 * math.pi) * poly


# ------------------------------------------------------------ did_aa_validation


def test_did_two_sample_algebra(spark, tmp_path):
    arm0 = [u for u in range(1, 300) if _arm(u) == 0][:3]
    arm1 = [u for u in range(1, 300) if _arm(u) == 1][:2]
    rows, eid = [], 0
    # every user: one pre event (value 0, week 0) + one post event at
    # week 3 carrying the whole delta
    for uid, d in list(zip(arm0, (1.0, 2.0, 3.0))) + list(
            zip(arm1, (2.0, 4.0))):
        eid += 1
        rows.append((eid, _wk(0), uid, "view", 0.0, "{}"))
        eid += 1
        rows.append((eid, _wk(3), uid, "view", d, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = q_did_aa_validation(spark, str(tmp_path)).collect()[0]
    assert (row["n_arm0"], row["n_arm1"]) == (3, 2)
    assert (row["mean_delta_arm0"], row["mean_delta_arm1"]) == (2.0, 3.0)
    assert row["did_estimate"] == 1.0
    se = math.sqrt(1.0 / 3 + 2.0 / 2)  # s2 arm0 = 1, arm1 = 2
    assert row["se"] == round(se, 4)
    assert row["ci_lo"] == round(1 - 1.96 * se, 4)
    assert row["ci_hi"] == round(1 + 1.96 * se, 4)
    assert row["null_respected"] is True


# ------------------------------------------------------------ bh_discovery_scan


def test_bh_stepup_discoveries(spark, tmp_path):
    src_lengths = {
        "big": [100, 100, 200, 200],      # far below grand mean
        "hi": [1000, 1000, 1100, 1100],   # far above
        "mid": [600, 600, 700, 700],      # near the grand mean
    }
    docs, i = [], 0
    for s, lens in src_lengths.items():
        for n in lens:
            docs.append((i, "x", "en", s, n))
            i += 1
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r["source"]: r
           for r in q_bh_discovery_scan(spark, str(tmp_path)).collect()}
    gm = sum(sum(v) for v in src_lengths.values()) / 12.0
    for s, lens in src_lengths.items():
        n = len(lens)
        m = sum(lens) / n
        s2 = sum((x - m) ** 2 for x in lens) / (n - 1)
        z = (m - gm) / math.sqrt(s2 / n)
        assert out[s]["z_score"] == round(z, 4)
        assert out[s]["p_value"] == round(_norm_tail_p(z), 6)
    assert out["big"]["discovery"] is True
    assert out["hi"]["discovery"] is True
    assert out["mid"]["discovery"] is False


# --------------------------------------------------------- mann_whitney_lengths


def test_mann_whitney_u_with_ties(spark, tmp_path):
    docs = [(0, "en", 1), (1, "en", 2), (2, "en", 3),
            (3, "de", 2), (4, "de", 4), (5, "fr", 999)]  # fr ignored
    spark.createDataFrame(
        [(i, "x", lg, "s", n) for i, lg, n in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = q_mann_whitney_lengths(spark, str(tmp_path)).collect()[0]
    assert (row["n_en"], row["n_de"]) == (3, 2)
    assert row["u_stat"] == 1.5   # de below en: 0 + 0.5 (tie at 2) + 1
    assert row["u_expected"] == 3.0
    sigma = math.sqrt(3 * 2 / 12.0 * ((5 + 1) - 6 / (5 * 4)))
    assert row["z_score"] == round((1.5 - 3.0) / sigma, 4)
    assert row["significant"] is False
