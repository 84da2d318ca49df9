"""Round-5 batch-41 operators on crafted inputs, verified against
independent Python computations: shard_local_dedup_gap (two-phase dedup
arithmetic), metric_choice_agreement (cosine vs euclid rankings incl.
the unit-norm identity case), zero_inflation_score_test (van den Broek
closed form on planted sparse/dense activity grids)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from collections import Counter

from pdf_extractor_spark.queries import (
    _METRIC_AGREE_K,
    _METRIC_AGREE_MOD,
    _SHARD_N,
    q_metric_choice_agreement,
    q_shard_local_dedup_gap,
    q_zero_inflation_score_test,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_user_days(spark, path, user_days):
    rows, eid = [], 0
    for u, days in user_days.items():
        for d in days:
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=u),
                         u, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# -------------------------------------------------------- shard_local_dedup_gap


def _shard_py(texts):
    per_shard: Counter = Counter()
    per_h: dict[str, set] = {}
    copies: Counter = Counter()
    for i, t in enumerate(texts, 1):
        h = hashlib.md5(t.encode()).hexdigest()
        shard = _md5int(str(i)) % _SHARD_N
        per_shard[(shard, h)] += 1
        per_h.setdefault(h, set()).add(shard)
        copies[h] += 1
    shard_local = sum(len(s) for s in per_h.values())
    global_d = len(per_h)
    n = sum(copies.values())
    return {
        "n_docs": n,
        "shard_local_distinct": shard_local,
        "global_distinct": global_d,
        "cross_shard_dup_groups": shard_local - global_d,
        "map_side_reduction": round(1 - shard_local / n, 4),
        "residual_dup_rate": round((shard_local - global_d)
                                   / shard_local, 4),
        "n_shards": _SHARD_N,
    }


def test_shard_gap_matches_python(spark, tmp_path):
    texts = ["dup body one"] * 9 + ["dup body two"] * 5
    texts += [f"unique {i}" for i in range(10)]
    _write_docs(spark, tmp_path, texts)
    want = _shard_py(texts)
    r = q_shard_local_dedup_gap(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    # 9 copies spread over 8 doc_id-hash shards MUST straddle shards
    assert r["cross_shard_dup_groups"] > 0
    assert r["map_side_reduction"] > 0.0


def test_shard_gap_all_unique_corpus(spark, tmp_path):
    texts = [f"only one of these {i}" for i in range(20)]
    _write_docs(spark, tmp_path, texts)
    r = q_shard_local_dedup_gap(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == r["global_distinct"] == 20
    assert r["shard_local_distinct"] == 20
    assert r["cross_shard_dup_groups"] == 0
    assert r["map_side_reduction"] == 0.0
    assert r["residual_dup_rate"] == 0.0


# ------------------------------------------------------ metric_choice_agreement


def test_metric_agreement_unit_norms_identical(spark, tmp_path):
    # 8 distinct unit vectors in 8-D: cosine and euclid rank identically
    rows = []
    for i in range(8):
        v = [0.0] * 8
        v[i] = 1.0
        rows.append((i, v))
    # plus mild rotations so rankings are non-trivial but still unit-norm
    for i in range(8, 12):
        v = [0.0] * 8
        v[i % 8] = 0.6
        v[(i + 1) % 8] = 0.8
        rows.append((i, v))
    _write_embeddings(spark, tmp_path, rows)
    r = q_metric_choice_agreement(spark, str(tmp_path)).collect()[0]
    assert r["k"] == _METRIC_AGREE_K
    assert r["n_queries"] == sum(
        1 for i, _ in rows if i % _METRIC_AGREE_MOD == 0)
    assert r["mean_topk_overlap"] == 1.0
    assert r["top1_agree_rate"] == 1.0
    assert r["norm_cv"] == 0.0


def test_metric_agreement_norm_spread_breaks_top1(spark, tmp_path):
    # query 0 points along x; a SHORT vector in a different direction is
    # euclid-closest while a long same-direction vector wins on cosine
    rows = [
        (0, [10.0, 0.0]),
        (1, [0.1, 0.1]),      # euclid-nearest to nothing aligned
        (2, [30.0, 0.0]),     # cosine-perfect, euclid-far
        (3, [9.0, 4.0]),
        (5, [0.2, -0.1]),
        (6, [11.0, 1.0]),
    ]
    _write_embeddings(spark, tmp_path, rows)
    r = q_metric_choice_agreement(spark, str(tmp_path)).collect()[0]
    assert r["norm_cv"] > 0.5
    assert r["top1_agree_rate"] < 1.0
    assert 0.0 <= r["mean_topk_overlap"] <= 1.0


# ---------------------------------------------------- zero_inflation_score_test


def _zip_py(user_days):
    users = len(user_days)
    days = {d for ds in user_days.values() for d in ds}
    nd = len(days)
    n = users * nd
    nnz = sum(len(set(ds)) for ds in user_days.values())
    n_events = sum(len(ds) for ds in user_days.values())
    n0 = n - nnz
    lam = n_events / n
    p0 = math.exp(-lam)
    den = n * p0 * (1 - p0) - n * lam * p0 * p0
    s = (n0 - n * p0) ** 2 / den if den != 0 else None
    return {
        "n_cells": n, "n_zero_cells": n0,
        "lambda_hat": round(lam, 4), "p0_hat": round(p0, 6),
        "zero_share": round(n0 / n, 6),
        "score_stat": round(s, 4),
        "zero_inflated": int(s > 3.8415),
    }


def test_zip_inflated_grid_detected(spark, tmp_path):
    # 4 users active every day, 40 users who show up once: a dormant
    # subpopulation -> way more zero cells than Poisson(lambda) allows
    user_days = {u: list(range(20)) for u in range(1, 5)}
    for u in range(5, 45):
        user_days[u] = [u % 20]
    _write_user_days(spark, tmp_path, user_days)
    want = _zip_py(user_days)
    r = q_zero_inflation_score_test(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert r["zero_inflated"] == 1


def test_zip_dense_grid_not_flagged(spark, tmp_path):
    # every user active every day (multiple events): zero cells = 0,
    # far FEWER zeros than Poisson expects -> not zero-inflated
    user_days = {u: [d for d in range(15) for _ in range(2)]
                 for u in range(1, 9)}
    _write_user_days(spark, tmp_path, user_days)
    want = _zip_py(user_days)
    r = q_zero_inflation_score_test(spark, str(tmp_path)).collect()[0]
    assert r["n_zero_cells"] == 0
    assert r["score_stat"] == want["score_stat"]
    assert r["zero_inflated"] == want["zero_inflated"]
