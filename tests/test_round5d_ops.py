"""Round-5 batch-13 operators on crafted inputs, verified against
independent Python computations (not just the DuckDB oracles the contract
suite replays): funnel_latency (time-to-convert percentiles under the
strict-ordering funnel), knn_hubness (in-degree histogram of the exact
cosine top-k over a declared query sample), lateness_profile (watermark
rehearsal over a deterministically jittered arrival replay)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import numpy as np

from pdf_extractor_spark.queries import (
    _HUB_K,
    _HUB_SAMPLE_MOD,
    _LATE_JITTER_MOD,
    _LATE_SHARDS,
    q_funnel_latency,
    q_knn_hubness,
    q_lateness_profile,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, ts, u, et in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, list[float])."""
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


# ------------------------------------------------------------ funnel_latency


def test_funnel_latency_strict_ordering_and_percentiles(spark, tmp_path):
    s = lambda n: T0 + dt.timedelta(seconds=n)  # noqa: E731
    rows = [
        # user 1 completes the whole funnel: vc=10, cp=60, vp=70
        (1, s(0), 1, "view"),
        (2, s(10), 1, "click"),
        (3, s(70), 1, "purchase"),
        # user 2 stops at click: vc=30
        (4, s(0), 2, "view"),
        (5, s(30), 2, "click"),
        # user 3's purchase PRECEDES any click -> strict ordering drops it
        (6, s(0), 3, "purchase"),
        (7, s(10), 3, "view"),
    ]
    _write_events(spark, tmp_path, rows)
    row = q_funnel_latency(spark, str(tmp_path)).collect()[0]
    assert row["n_view_click"] == 2
    # interpolated percentiles over [10, 30]
    assert row["p50_view_click"] == 20.0
    assert row["p90_view_click"] == round(10 + 0.9 * 20, 2)
    assert row["max_view_click"] == 30
    assert row["n_click_purchase"] == 1
    assert row["p50_click_purchase"] == 60.0
    assert row["max_click_purchase"] == 60
    assert row["n_view_purchase"] == 1
    assert row["p50_view_purchase"] == 70.0
    assert row["max_view_purchase"] == 70


def test_funnel_latency_no_completers_yields_nulls(spark, tmp_path):
    rows = [(1, T0, 1, "view"), (2, T0 + dt.timedelta(seconds=5), 2, "view")]
    _write_events(spark, tmp_path, rows)
    row = q_funnel_latency(spark, str(tmp_path)).collect()[0]
    assert row["n_view_click"] == 0
    assert row["p50_view_click"] is None
    assert row["max_view_click"] is None


# -------------------------------------------------------------- knn_hubness


def _hubness_expected(vecs: dict[int, list[float]]):
    """Independent replication: sampled queries, exact cosine, 4dp
    pre-rank rounding, (cos desc, nbr asc) ties, top-k, in-degree
    histogram with shares."""
    qids = sorted(v for v in vecs if v % _HUB_SAMPLE_MOD == 0)
    indeg = {v: 0 for v in vecs}
    for q in qids:
        qv = np.asarray(vecs[q], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-30)
        scored = []
        for v, emb in vecs.items():
            if v == q:
                continue
            ev = np.asarray(emb, dtype=np.float64)
            ev = ev / max(np.linalg.norm(ev), 1e-30)
            scored.append((round(float(ev @ qv), 4), v))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for _, v in scored[:_HUB_K]:
            indeg[v] += 1
    hist: dict[int, int] = {}
    for d in indeg.values():
        hist[d] = hist.get(d, 0) + 1
    return {
        d: (n, round(n / len(vecs), 4)) for d, n in hist.items()
    }


def test_knn_hubness_matches_independent_bruteforce(spark, tmp_path):
    # 10 vectors on a 2-sphere fan; a deliberate "hub" at vec 9 (the mean
    # direction) plus an isolated outlier at vec 8 that nothing retrieves.
    vecs: dict[int, list[float]] = {}
    for i in range(8):
        a = 0.15 * i
        vecs[i] = [math.cos(a), math.sin(a), 0.1]
    vecs[8] = [0.0, 0.0, -1.0]  # anti-aligned outlier
    vecs[9] = [math.cos(0.5), math.sin(0.5), 0.1]  # near the fan centre
    _write_embeddings(spark, tmp_path, sorted(vecs.items()))
    got = {
        r["in_degree"]: (r["n_vectors"], r["share"])
        for r in q_knn_hubness(spark, str(tmp_path)).collect()
    }
    assert got == _hubness_expected(vecs)
    # sanity on the fixture's intent: the outlier is never a neighbor
    assert 0 in got


def test_knn_hubness_share_sums_to_one(spark, tmp_path):
    vecs = {i: [1.0 + i, float(i % 3), 1.0] for i in range(12)}
    _write_embeddings(spark, tmp_path, sorted(vecs.items()))
    rows = q_knn_hubness(spark, str(tmp_path)).collect()
    assert sum(r["n_vectors"] for r in rows) == 12
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01


# --------------------------------------------------------- lateness_profile


def _lateness_expected(rows):
    """rows: (event_id, ts). Replicates shard/jitter/running-high-wm."""
    per_shard: dict[int, list[tuple[int, int, int]]] = {}
    for i, ts in rows:
        akey = i + _md5int(str(i)) % _LATE_JITTER_MOD
        per_shard.setdefault(i % _LATE_SHARDS, []).append(
            (akey, i, int(ts.timestamp()))
        )
    lates = []
    for evs in per_shard.values():
        hi = None
        for _, _, epoch in sorted(evs):
            hi = epoch if hi is None else max(hi, epoch)
            lates.append(hi - epoch)
    arr = np.asarray(sorted(lates), dtype=np.float64)
    return {
        "n_events": len(arr),
        "p50_late_s": round(float(np.percentile(arr, 50)), 2),
        "p90_late_s": round(float(np.percentile(arr, 90)), 2),
        "max_late_s": int(arr.max()),
        "drop_share_1m": round(float((arr > 60).mean()), 4),
        "drop_share_1h": round(float((arr > 3600).mean()), 4),
    }


def test_lateness_profile_matches_independent_replay(spark, tmp_path):
    # 40 events, 90 s apart: shard stride is 32 ids, jitter mod 997 spans
    # ~31 positions, so some same-shard pairs really do reorder.
    rows = [
        (i, T0 + dt.timedelta(seconds=90 * i), 1, "view") for i in range(40)
    ]
    _write_events(spark, tmp_path, rows)
    row = q_lateness_profile(spark, str(tmp_path)).collect()[0]
    exp = _lateness_expected([(i, ts) for i, ts, _, _ in rows])
    for k, v in exp.items():
        assert row[k] == v, (k, row[k], v)


def test_lateness_profile_in_order_stream_is_all_zero(spark, tmp_path):
    # events 1e6 s apart: the jitter (<997 arrival-key units vs id stride
    # 1) cannot overcome the shard stride of 32 ids -> nothing is late
    # ... unless two ids land in the same shard within the jitter reach.
    # Use 8 events (< one shard stride apart in id space -> all distinct
    # shards) so every shard has exactly one event: lateness is 0.
    rows = [
        (i, T0 + dt.timedelta(seconds=10 * i), 1, "view") for i in range(8)
    ]
    _write_events(spark, tmp_path, rows)
    row = q_lateness_profile(spark, str(tmp_path)).collect()[0]
    assert row["n_events"] == 8
    assert row["max_late_s"] == 0
    assert row["drop_share_1m"] == 0.0


# --------------------------------------------------------- join_fanout_probe


def test_join_fanout_probe_exact_prediction_and_orphans(spark, tmp_path):
    spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1,), (1,), (4,), (4,), (4,)], "l_orderkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    from pdf_extractor_spark.queries import q_join_fanout_probe

    row = q_join_fanout_probe(spark, str(tmp_path)).collect()[0]
    assert row["n_keys_union"] == 4
    assert row["n_keys_matched"] == 1
    assert row["n_keys_left_only"] == 2   # orders 2, 3 have no lineitems
    assert row["n_keys_right_only"] == 1  # lineitem key 4 has no order
    assert row["n_rows_left"] == 3 and row["n_rows_right"] == 5
    assert row["predicted_rows"] == 2     # only key 1 joins: 1*2
    assert row["max_key_fanout"] == 2
    assert row["p99_fanout"] == 2.0
    assert row["max_fanout_share"] == 1.0


# ---------------------------------------------------- shipping_priority_topk


def test_shipping_priority_topk_filters_group_and_round(spark, tmp_path):
    import datetime as dt

    spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTOMOBILE")],
        "c_custkey bigint, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    d_ok = dt.datetime(1998, 1, 1)
    d_late = dt.datetime(1998, 7, 1)
    spark.createDataFrame(
        [
            (10, 1, d_ok, "1-URGENT"),     # qualifies
            (11, 1, d_late, "1-URGENT"),   # order too late
            (12, 2, d_ok, "1-URGENT"),     # wrong segment
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp,"
        " o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (10, 100.0, 0.10, d_late),  # 90.00
            (10, 50.0, 0.05, d_late),   # 47.50
            (10, 999.0, 0.0, d_ok),     # shipped too early -> excluded
            (11, 10.0, 0.0, d_late),
            (12, 10.0, 0.0, d_late),
        ],
        "l_orderkey bigint, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    from pdf_extractor_spark.queries import q_shipping_priority_topk

    rows = q_shipping_priority_topk(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["l_orderkey"] == 10
    assert r["revenue"] == 137.5
    assert r["o_orderpriority"] == "1-URGENT"


def test_shipping_priority_topk_broadcasts_customer(spark):
    from pdf_extractor_spark.queries import q_shipping_priority_topk

    plan = q_shipping_priority_topk(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 is not a global sort


# ------------------------------------------------------- dim_broadcast_audit


def test_dim_broadcast_audit_measures_octets(spark, tmp_path):
    # region: 'é' is 2 UTF-8 octets -> est_bytes must use octets, not chars
    spark.createDataFrame(
        [(0, "é"), (1, "abc")], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/region.parquet")
    spark.createDataFrame(
        [(0, "x", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(0, "s0", 0, 1.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/supplier.parquet"
    )
    spark.createDataFrame(
        [(0, "cust", "SEG", 1.0, 0)],
        "c_custkey bigint, c_name string, c_mktsegment string,"
        " c_acctbal double, c_nationkey int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    spark.createDataFrame(
        [(0, "part", "BR", "TY", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    from pdf_extractor_spark.queries import q_dim_broadcast_audit

    got = {r["dim_table"]: r for r in
           q_dim_broadcast_audit(spark, str(tmp_path)).collect()}
    assert set(got) == {"region", "nation", "supplier", "customer", "part"}
    # region: octets(é)=2 + octets(abc)=3 + 2 rows * 4 fixed = 13
    assert got["region"]["est_bytes"] == 13
    assert got["region"]["n_rows"] == 2
    # customer: 4 + 3 octets + 1 row * 20 fixed = 27
    assert got["customer"]["est_bytes"] == 27
    assert all(r["auto_broadcastable"] for r in got.values())


# -------------------------------------------------------- embedding_isotropy


def _isotropy_expected(vecs):
    """Independent replication: population covariance from float32-stored
    vectors, 1e-30 guards, the op's exact rounding."""
    m = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]
    )
    n, d = m.shape
    mean = m.mean(axis=0)
    cov = (m.T @ m) / n - np.outer(mean, mean)
    var = np.diag(cov).copy()
    trace = float(var.sum())
    corr = cov / np.maximum(np.sqrt(np.maximum(np.outer(var, var), 0.0)), 1e-30)
    off = np.abs(corr[np.triu_indices(d, k=1)])
    return {
        "n_vecs": n,
        "dim": d,
        "trace_var": round(trace, 4),
        "top_var_share": round(float(var.max()) / max(trace, 1e-30), 4),
        "var_participation_dims": round(
            trace * trace / max(float((var * var).sum()), 1e-30), 2
        ),
        "mean_abs_offdiag_corr": round(float(off.mean()), 4),
        "max_abs_offdiag_corr": round(float(off.max()), 4),
        "high_corr_pairs": int((off > 0.5).sum()),
    }


def test_embedding_isotropy_matches_independent_numpy(spark, tmp_path):
    # dim2 = 2*dim1 (perfect correlation), dim3 alternates independently
    vecs = [[float(i), 2.0 * i, z] for i, z in zip(range(1, 5), (1, -1, 1, -1))]
    _write_embeddings(spark, tmp_path, [(i, v) for i, v in enumerate(vecs)])
    from pdf_extractor_spark.queries import q_embedding_isotropy

    row = q_embedding_isotropy(spark, str(tmp_path)).collect()[0]
    exp = _isotropy_expected(vecs)
    for k, v in exp.items():
        assert row[k] == v, (k, row[k], v)
    # the engineered structure: exactly the dim1-dim2 pair is high-corr
    assert row["high_corr_pairs"] == 1
    assert row["max_abs_offdiag_corr"] == 1.0


# --------------------------------------------------- mirror_direction_matrix


def test_mirror_direction_matrix_attributes_direction(spark, tmp_path):
    rows = [
        (1, "xxx", "en", "srcA"),   # origin of group x
        (2, "xxx", "en", "srcB"),   # copy A -> B
        (3, "xxx", "en", "srcB"),   # copy A -> B
        (4, "yyy", "en", "srcA"),   # origin of group y
        (5, "yyy", "en", "srcC"),   # copy A -> C
        (6, "zzz", "en", "srcC"),   # unique, no row
    ]
    import pandas as pd_

    pdf = pd_.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from pdf_extractor_spark.queries import q_mirror_direction_matrix

    got = {(r["origin_source"], r["copy_source"]):
           (r["n_copies"], r["n_groups"])
           for r in q_mirror_direction_matrix(spark, str(tmp_path)).collect()}
    assert got == {("srcA", "srcB"): (2, 1), ("srcA", "srcC"): (1, 1)}


def test_mirror_direction_matrix_clean_corpus_sentinel(spark, tmp_path):
    import pandas as pd_

    pdf = pd_.DataFrame(
        [(1, "aa", "en", "s"), (2, "bb", "en", "s")],
        columns=["doc_id", "text", "lang", "source"],
    )
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from pdf_extractor_spark.queries import q_mirror_direction_matrix

    rows = q_mirror_direction_matrix(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["origin_source"] == "(none)"
    assert rows[0]["n_copies"] == 0


# --------------------------------------------------- langid_cascade_routing


def test_langid_cascade_routing_margins_and_accuracy(spark, tmp_path):
    import pandas as pd_

    eleven = "the aa bb cc dd ee ff gg hh ii jj"      # ratio 1/11 ~ 0.0909
    rows = [
        (1, eleven, "en", "s"),                # confident only at margin .01
        (2, "the cat", "en", "s"),             # ratio .5: always confident, ok
        (3, "aa bb cc dd ee", "de", "s"),      # ratio 0: confident, correct
        (4, "aa bb cc dd ee", "en", "s"),      # ratio 0: confident, WRONG
    ]
    pdf = pd_.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from pdf_extractor_spark.queries import q_langid_cascade_routing

    got = {r["margin"]: r for r in
           q_langid_cascade_routing(spark, str(tmp_path)).collect()}
    assert set(got) == {0.01, 0.02, 0.04}
    m1, m2, m4 = got[0.01], got[0.02], got[0.04]
    assert (m1["n_confident"], m1["n_routed"]) == (4, 0)
    assert m1["confident_acc"] == 0.75
    assert (m2["n_confident"], m2["n_routed"]) == (3, 1)
    assert m2["confident_acc"] == round(2 / 3, 4)
    assert (m4["n_confident"], m4["n_routed"]) == (3, 1)
    assert m4["routed_share"] == 0.25


# --------------------------------------------------------- big_spender_orders


def test_big_spender_orders_having_then_detail(spark, tmp_path):
    spark.createDataFrame(
        [(1, T0, 500.0), (2, T0, 900.0)],
        "o_orderkey bigint, o_orderdate timestamp, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, 200.0), (1, 100.0), (2, 100.0)],
        "l_orderkey bigint, l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    from pdf_extractor_spark.queries import q_big_spender_orders

    rows = q_big_spender_orders(spark, str(tmp_path)).collect()
    assert len(rows) == 1  # order 2's 100 < 250 threshold
    assert rows[0]["o_orderkey"] == 1
    assert rows[0]["total_qty"] == 300.0
    assert rows[0]["n_items"] == 2


# ------------------------------------------------------ region_revenue_rollup


def test_region_revenue_rollup_chain(spark, tmp_path):
    spark.createDataFrame(
        [(0, "R0")], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/region.parquet")
    spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(10, "s", 0), (11, "s", 1)],
        "s_suppkey bigint, s_name string, s_nationkey int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/supplier.parquet"
    )
    spark.createDataFrame(
        [(10, 100.0, 0.1), (10, 50.0, 0.0), (11, 200.0, 0.5)],
        "l_suppkey bigint, l_extendedprice double, l_discount double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    from pdf_extractor_spark.queries import q_region_revenue_rollup

    got = {(r["r_name"], r["n_name"]): (r["revenue"], r["n_items"])
           for r in q_region_revenue_rollup(spark, str(tmp_path)).collect()}
    assert got == {("R0", "N0"): (140.0, 2), ("R0", "N1"): (100.0, 1)}


# ------------------------------------------------------------ retention_sweep


def test_retention_sweep_day_grain_policies(spark, tmp_path):
    noon = dt.timedelta(hours=12)  # day-boundary safe under any fixed tz
    day = lambda d: T0 + dt.timedelta(days=d) + noon  # noqa: E731
    rows = []
    eid = 0
    for _ in range(5):
        eid += 1; rows.append((eid, day(0), 1, "view"))     # u1 old bulk
    eid += 1; rows.append((eid, day(30), 1, "view"))        # u1 recent
    for _ in range(3):
        eid += 1; rows.append((eid, day(0), 2, "view"))     # u2 gone cold
    for _ in range(2):
        eid += 1; rows.append((eid, day(20), 3, "view"))    # u3 mid-age
    _write_events(spark, tmp_path, rows)
    from pdf_extractor_spark.queries import q_retention_sweep

    got = {r["ttl_days"]: r for r in
           q_retention_sweep(spark, str(tmp_path)).collect()}
    # max day = 30; cutoffs: 23 / 16 / 9
    assert (got[7]["n_events_dropped"], got[7]["n_users_erased"]) == (10, 2)
    assert got[7]["drop_share"] == round(10 / 11, 4)
    assert got[7]["users_erased_share"] == round(2 / 3, 4)
    assert (got[14]["n_events_dropped"], got[14]["n_users_erased"]) == (8, 1)
    assert (got[21]["n_events_dropped"], got[21]["n_users_erased"]) == (8, 1)


# -------------------------------------------------------- sketch_error_audit


def _sketch_estimate(values, q):
    """Independent log-linear sketch replication (4 sub-bins/octave)."""
    bins: dict[int, int] = {}
    for n in values:
        k = n.bit_length() - 1
        sub = (4 * n) // (1 << k) - 4
        bins[4 * k + sub] = bins.get(4 * k + sub, 0) + 1
    total = float(sum(bins.values()))
    cume = 0.0
    for bin_id in sorted(bins):
        cnt = bins[bin_id]
        cume += cnt
        if cume >= q * total and (cume - cnt) < q * total:
            k, sub = bin_id // 4, bin_id % 4
            lo = (1 << k) * (1.0 + sub / 4.0)
            hi = (1 << k) * (1.0 + (sub + 1) / 4.0)
            return round(lo + (q * total - (cume - cnt)) / cnt * (hi - lo), 4)
    raise AssertionError("walk failed")


def test_sketch_error_audit_matches_independent_sketch(spark, tmp_path):
    import pandas as pd_

    values = [4] * 4 + [8] * 3 + [16] * 2 + [100]
    rows = [(i, "x" * n, "en", "s") for i, n in enumerate(values)]
    pdf = pd_.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from pdf_extractor_spark.queries import q_sketch_error_audit

    got = {r["q"]: r for r in
           q_sketch_error_audit(spark, str(tmp_path)).collect()}
    arr = np.asarray(sorted(values), dtype=np.float64)
    for q in (0.5, 0.9, 0.99):
        est = _sketch_estimate(values, q)
        exact = round(float(np.percentile(arr, q * 100)), 4)
        assert got[q]["estimate"] == est, (q, got[q]["estimate"], est)
        assert got[q]["exact"] == exact
        rel = round(abs(est - exact) / max(exact, 1e-30), 4)
        assert got[q]["rel_err"] == rel
        assert got[q]["within_bound"] == (abs(est - exact)
                                          / max(exact, 1e-30) <= 0.25)


# --------------------------------------------------------------- rfm_features


def test_rfm_features_per_user_columns(spark, tmp_path):
    day = lambda d: T0 + dt.timedelta(days=d, hours=12)  # noqa: E731
    rows_raw = [
        # u1: events days 0 and 10; purchase 25.5 on day 10 -> recent
        (1, day(0), 1, "view", 0.0),
        (2, day(10), 1, "purchase", 25.5),
        # u2: single view day 1 -> cold
        (3, day(1), 2, "view", 0.0),
    ]
    spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows_raw],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from pdf_extractor_spark.queries import q_rfm_features

    got = {r["user_id"]: r for r in
           q_rfm_features(spark, str(tmp_path)).collect()}
    u1, u2 = got[1], got[2]
    assert (u1["recency_days"], u1["frequency"], u1["monetary"],
            u1["n_purchases"], u1["tenure_days"], u1["active_7d"]) == (
        0, 2, 25.5, 1, 10, True)
    assert (u2["recency_days"], u2["frequency"], u2["monetary"],
            u2["n_purchases"], u2["tenure_days"], u2["active_7d"]) == (
        9, 1, 0.0, 0, 0, False)


# ----------------------------------------------------------------- sq8_recall


def _sq8_expected(vecs: dict[int, list[float]], k=5, mod=50):
    def quant(v):
        v = np.asarray(v, dtype=np.float32).astype(np.float64)
        scale = 127.0 / max(float(np.abs(v).max()), 1e-30)
        codes = np.floor(v * scale + 0.5).astype(np.int64)
        return v, scale, codes

    qs = {i: quant(v) for i, v in vecs.items()}
    out = {}
    for qid in sorted(v for v in vecs if v % mod == 0):
        qv, qsc, qc = qs[qid]
        fs, zs = [], []
        for vid in sorted(vecs):
            if vid == qid:
                continue
            ev, esc, ec = qs[vid]
            fs.append((round(float(ev @ qv), 4), vid))
            zs.append((round(float(ec @ qc) / (esc * qsc), 4), vid))
        fs.sort(key=lambda t: (-t[0], t[1]))
        zs.sort(key=lambda t: (-t[0], t[1]))
        ftop = {v for _, v in fs[:k]}
        ztop = {v for _, v in zs[:k]}
        n = len(ftop & ztop)
        out[qid] = (n, round(n / k, 4))
    return out


def test_sq8_recall_matches_independent_quantizer(spark, tmp_path):
    rng = np.random.RandomState(7)
    vecs = {i: (rng.randn(8) * (1 + 3 * (i % 3))).tolist() for i in range(9)}
    _write_embeddings(spark, tmp_path, sorted(vecs.items()))
    from pdf_extractor_spark.queries import q_sq8_recall

    got = {r["query_id"]: (r["n_overlap"], r["recall_at5"])
           for r in q_sq8_recall(spark, str(tmp_path)).collect()}
    assert got == _sq8_expected(vecs)
    assert set(got) == {0}  # only vec 0 matches the %50 query sample


# --------------------------------------------------------- fk_integrity_audit


def test_fk_integrity_audit_counts_orphans(spark, tmp_path):
    # minimal star: nation 0 exists, customer rows point at 0 (ok) and 9
    # (orphan); the other 6 edges are empty-child or clean
    spark.createDataFrame(
        [(0, "R")], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/region.parquet")
    spark.createDataFrame(
        [(0, "N", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(1, "c", 0), (2, "c", 9), (3, "c", 9)],
        "c_custkey bigint, c_name string, c_nationkey int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    spark.createDataFrame(
        [(10, 1)], "o_orderkey bigint, o_custkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(10, 100, 200)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    spark.createDataFrame(
        [(100, "p")], "p_partkey bigint, p_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(200, "s", 0)], "s_suppkey bigint, s_name string, s_nationkey int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/supplier.parquet"
    )
    from pdf_extractor_spark.queries import q_fk_integrity_audit

    got = {r["fk"]: r for r in
           q_fk_integrity_audit(spark, str(tmp_path)).collect()}
    c = got["customer.c_nationkey->nation"]
    assert (c["n_child_rows"], c["n_child_keys"]) == (3, 2)
    assert (c["n_orphan_rows"], c["n_orphan_keys"]) == (2, 1)
    assert c["orphan_row_share"] == round(2 / 3, 4)
    for clean in ("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
                  "lineitem.l_suppkey->supplier", "nation.n_regionkey->region",
                  "orders.o_custkey->customer", "supplier.s_nationkey->nation"):
        assert got[clean]["n_orphan_rows"] == 0, clean


# ------------------------------------------------------- column_bytes_profile


def test_column_bytes_profile_measures_octets(spark, tmp_path):
    import pandas as pd_

    # 'é' = 2 octets; totals: text 5+2=7, lang 2*2=4, source 1*2=2... rows=2
    pdf = pd_.DataFrame(
        [(1, "héllo", "en", "a"), (2, "x", "de", "b")],
        columns=["doc_id", "text", "lang", "source"],
    )
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from pdf_extractor_spark.queries import q_column_bytes_profile

    got = {r["col"]: r for r in
           q_column_bytes_profile(spark, str(tmp_path)).collect()}
    assert got["text"]["total_bytes"] == 7   # héllo = 6 octets + x = 1
    assert got["lang"]["total_bytes"] == 4
    assert got["source"]["total_bytes"] == 2
    assert got["doc_id"]["total_bytes"] == 16
    assert got["n_chars"]["total_bytes"] == 16
    total = sum(r["total_bytes"] for r in got.values())
    assert got["text"]["share"] == round(7 / total, 4)
    assert got["text"]["bytes_per_row"] == 3.5


# -------------------------------------------------------------- skew_salt_plan


def test_skew_salt_plan_prescribes_factors(spark, tmp_path):
    # 3 keys: 100, 10, 10 events -> mean 40, budget = ceil(4*40) = 160?
    # budget = ceil(4 * total/keys) = ceil(4*120/3) = 160 -> nothing heavy.
    # Use: 1000, 10, 10 -> mean 340, budget 1360 -> still 1? Make one key
    # dominate: 1000, 10, 10 => budget=1360 > 1000: uniform... budget is
    # 4x mean, so a single key must exceed 4x mean: 3 keys with
    # 2000, 100, 100 -> mean 733.3, budget ceil(2933.33)=2934 > 2000. The
    # mean includes the heavy key; use MANY small keys + one giant:
    # 20 keys of 10 + one of 2000 -> mean = 2200/21 = 104.76, budget 420,
    # giant needs salt_factor ceil(2000/420) = 5.
    rows = []
    eid = 0
    for u in range(20):
        for _ in range(10):
            eid += 1
            rows.append((eid, T0 + dt.timedelta(seconds=eid), 100 + u, "view"))
    for _ in range(2000):
        eid += 1
        rows.append((eid, T0 + dt.timedelta(seconds=eid), 999, "view"))
    _write_events(spark, tmp_path, rows)
    from pdf_extractor_spark.queries import q_skew_salt_plan

    plan = q_skew_salt_plan(spark, str(tmp_path)).collect()
    assert len(plan) == 10  # top-10 keys always emitted
    top = plan[0]
    assert top["user_id"] == 999 and top["n"] == 2000
    assert top["budget"] == 420
    assert top["needs_salt"] is True
    assert top["salt_factor"] == 5
    assert top["post_salt_max_rows"] == 400
    assert not any(r["needs_salt"] for r in plan[1:])
    assert all(r["salt_factor"] == 1 for r in plan[1:])


# -------------------------------------------------------------- state_size_plan


def test_state_size_plan_measured_active_keys(spark, tmp_path):
    rows = [
        (1, T0, 1, "view"),
        (2, T0 + dt.timedelta(seconds=30), 2, "view"),   # same minute
        (3, T0 + dt.timedelta(seconds=90), 1, "view"),   # next minute
    ]
    _write_events(spark, tmp_path, rows)
    from pdf_extractor_spark.queries import q_state_size_plan

    got = {r["window_s"]: r for r in
           q_state_size_plan(spark, str(tmp_path)).collect()}
    w60, w300, w3600 = got[60], got[300], got[3600]
    assert (w60["n_windows"], w60["max_active_keys"]) == (2, 2)
    assert w60["avg_active_keys"] == 1.5
    assert (w60["open_windows_1h"], w60["est_state_rows"]) == (61, 122)
    assert (w300["n_windows"], w300["max_active_keys"]) == (1, 2)
    assert (w300["open_windows_1h"], w300["est_state_rows"]) == (13, 26)
    assert (w3600["n_windows"], w3600["est_state_rows"]) == (1, 4)


# ---------------------------------------------------------- shingle_size_sweep


def test_shingle_size_sweep_discriminativeness(spark, tmp_path):
    import pandas as pd_

    pdf = pd_.DataFrame(
        [(1, "a b c", "en", "s"), (2, "a b d", "en", "s")],
        columns=["doc_id", "text", "lang", "source"],
    )
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from pdf_extractor_spark.queries import q_shingle_size_sweep

    got = {r["k"]: r for r in
           q_shingle_size_sweep(spark, str(tmp_path)).collect()}
    k2 = got[2]
    # doc1: "a b","b c"; doc2: "a b","b d" -> 4 total, 3 distinct
    assert (k2["total_shingles"], k2["distinct_shingles"]) == (4, 3)
    assert k2["dup_mass"] == 0.25
    assert (k2["multi_doc_shingles"], k2["multi_doc_share"]) == (
        1, round(1 / 3, 4))
    k3 = got[3]
    assert (k3["total_shingles"], k3["distinct_shingles"]) == (2, 2)
    assert k3["multi_doc_shingles"] == 0
    k5 = got[5]  # short docs fall back to one whole-doc shingle
    assert (k5["total_shingles"], k5["distinct_shingles"]) == (2, 2)


# -------------------------------------------------------- revenue_growth_trend


def test_revenue_growth_trend_windows(spark, tmp_path):
    mk = lambda y, m, d: dt.datetime(y, m, d)  # noqa: E731
    spark.createDataFrame(
        [
            (1, mk(2024, 1, 5), 100.0),
            (2, mk(2024, 1, 20), 100.0),
            (3, mk(2024, 2, 5), 300.0),
            (4, mk(2024, 3, 5), 150.0),
        ],
        "o_orderkey bigint, o_orderdate timestamp, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    from pdf_extractor_spark.queries import q_revenue_growth_trend

    rows = q_revenue_growth_trend(spark, str(tmp_path)).collect()
    assert [r["revenue"] for r in rows] == [200.0, 300.0, 150.0]
    assert rows[0]["mom_delta"] is None and rows[0]["mom_growth"] is None
    assert rows[1]["mom_delta"] == 100.0 and rows[1]["mom_growth"] == 0.5
    assert rows[2]["mom_delta"] == -150.0 and rows[2]["mom_growth"] == -0.5
    assert rows[2]["ma3"] == round((200 + 300 + 150) / 3, 2)


# ---------------------------------------------------------- dau_mau_stickiness


def test_dau_mau_stickiness_months(spark, tmp_path):
    d = lambda mo, day: dt.datetime(2024, mo, day, 12)  # noqa: E731
    rows = [
        (1, d(1, 1), 1, "view"),
        (2, d(1, 2), 1, "view"),
        (3, d(1, 1), 2, "view"),
        (4, d(2, 5), 3, "view"),
    ]
    _write_events(spark, tmp_path, rows)
    from pdf_extractor_spark.queries import q_dau_mau_stickiness

    rows_out = q_dau_mau_stickiness(spark, str(tmp_path)).collect()
    assert len(rows_out) == 2
    jan, feb = rows_out
    assert (jan["mau"], jan["avg_dau"], jan["stickiness"],
            jan["active_days"]) == (2, 1.5, 0.75, 2)
    assert (feb["mau"], feb["avg_dau"], feb["stickiness"]) == (1, 1.0, 1.0)


# -------------------------------------------------------------- fulfillment_sla


def test_fulfillment_sla_first_ship_latency(spark, tmp_path):
    mk = lambda day: dt.datetime(2024, 1, day, 12)  # noqa: E731
    spark.createDataFrame(
        [(1, mk(1), "1-URGENT"), (2, mk(1), "5-LOW")],
        "o_orderkey bigint, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        # order 1 ships on day 3 then day 20 -> first ship = +2 days
        # order 2 ships on day 1 + 40 -> +40 days (outside 30d SLA)
        [(1, mk(3)), (1, mk(20)), (2, dt.datetime(2024, 2, 10, 12))],
        "l_orderkey bigint, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    from pdf_extractor_spark.queries import q_fulfillment_sla

    got = {r["o_orderpriority"]: r for r in
           q_fulfillment_sla(spark, str(tmp_path)).collect()}
    u, low = got["1-URGENT"], got["5-LOW"]
    assert (u["n_orders"], u["p50_days"], u["max_days"],
            u["within_30d_share"]) == (1, 2.0, 2, 1.0)
    assert (low["p50_days"], low["within_30d_share"]) == (40.0, 0.0)


# --------------------------------------------------------- knn_label_agreement


def _knn_agreement_expected(vecs, labels, k=5, mod=4):
    out_counts: dict[int, list[int]] = {}
    for qid in sorted(v for v in vecs if v % mod == 0):
        qv = np.asarray(vecs[qid], dtype=np.float32).astype(np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-30)
        scored = []
        for vid in sorted(vecs):
            if vid == qid:
                continue
            ev = np.asarray(vecs[vid], dtype=np.float32).astype(np.float64)
            en = ev / max(np.linalg.norm(ev), 1e-30)
            scored.append((round(float(en @ qn), 4), vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        votes: dict[int, int] = {}
        for _, vid in scored[:k]:
            votes[labels[vid]] = votes.get(labels[vid], 0) + 1
        knn_label = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0][0]
        ql = labels[qid]
        n, a = out_counts.get(ql, [0, 0])
        out_counts[ql] = [n + 1, a + (1 if knn_label == ql else 0)]
    return {
        l: (n, a, round(a / n, 4)) for l, (n, a) in out_counts.items()
    }


def test_knn_label_agreement_matches_independent(spark, tmp_path):
    # two tight clusters (labels 0, 1) + one mislabeled point inside
    # cluster 0 carrying label 1 -> its knn majority disagrees
    vecs, labels = {}, {}
    for i in range(6):
        vecs[i] = [10.0 + 0.1 * i, 1.0, 0.0]
        labels[i] = 0
    for i in range(6, 11):
        vecs[i] = [-10.0 - 0.1 * i, 1.0, 0.0]
        labels[i] = 1
    vecs[12] = [10.5, 1.0, 0.0]   # sits in cluster 0...
    labels[12] = 1                # ...labeled 1 (mislabeled, qid 12%4=0)
    spark.createDataFrame(
        [(i, [float(x) for x in v], labels[i])
         for i, v in sorted(vecs.items())],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    from pdf_extractor_spark.queries import q_knn_label_agreement

    got = {r["label"]: (r["n_queries"], r["n_agree"], r["agreement_rate"])
           for r in q_knn_label_agreement(spark, str(tmp_path)).collect()}
    exp = _knn_agreement_expected(vecs, labels)
    assert got == exp
    # the engineered mislabel: label-1 queries include vec 12, which the
    # neighborhood outvotes
    assert got[1][2] < 1.0
