"""Round-5 batch-34 operators on crafted inputs, verified against
independent Python computations: deletion_propagation_audit (GDPR
tombstone counts), newey_west_trend_se (HAC SE vs a from-scratch
implementation, incl. the autocorrelated-series inflation),
encoding_win_estimate (dictionary-encoding byte math)."""

from __future__ import annotations

import datetime as dt
import math

from pdf_extractor_spark.queries import (
    _DELETE_MOD,
    _NW_LAG,
    q_deletion_propagation_audit,
    q_encoding_win_estimate,
    q_newey_west_trend_se,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs_ids(spark, path, ids):
    spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 10) for i in ids],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings_ids(spark, path, ids):
    spark.createDataFrame(
        [(i, [float(i), 0.0], 0) for i in ids],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append(
                (eid, _EPOCH + dt.timedelta(days=d, seconds=i), 1,
                 "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------- deletion_propagation_audit


def test_deletion_audit_counts(spark, tmp_path):
    doc_ids = list(range(95, 315))          # includes 101, 202, 303
    emb_ids = [i for i in doc_ids if i != 200] + [999]  # one missing, one orphan
    _write_docs_ids(spark, tmp_path, doc_ids)
    _write_embeddings_ids(spark, tmp_path, emb_ids)
    r = q_deletion_propagation_audit(spark, str(tmp_path)).collect()[0]
    n_del = sum(1 for i in doc_ids if i % _DELETE_MOD == 0)
    n_tomb = sum(1 for i in emb_ids if i % _DELETE_MOD == 0)
    assert r["n_docs"] == len(doc_ids)
    assert r["n_delete_requests"] == n_del == 3
    assert r["n_embedding_rows"] == len(emb_ids)
    assert r["embeddings_to_tombstone"] == n_tomb == 3
    assert r["preexisting_orphans"] == 1          # vec 999 has no doc
    assert r["docs_missing_vectors"] == 1         # doc 200 has no vec
    # with vec_id == doc_id keys, both-side deletion leaves exactly the
    # pre-existing orphans behind
    assert r["post_delete_orphans"] == 1
    assert r["propagation_clean"] == 1


# ----------------------------------------------------------- newey_west_trend_se


def _nw_py(counts):
    y = [float(c) for c in counts]
    n = len(y)
    t = list(range(n))
    mt = sum(t) / n
    my = sum(y) / n
    sxx = sum(tt * tt for tt in t) - sum(t) ** 2 / n
    b = (sum(tt * yy for tt, yy in zip(t, y))
         - sum(t) * sum(y) / n) / sxx
    e = [yy - (my + b * (tt - mt)) for tt, yy in zip(t, y)]
    u = [(tt - mt) * ee for tt, ee in zip(t, e)]
    sse = sum(ee * ee for ee in e)
    s0 = sum(uu * uu for uu in u)
    var_ols = sse / (n - 2) / sxx
    acc = s0
    for lag in range(1, _NW_LAG + 1):
        sl = sum(u[i] * u[i - lag] for i in range(lag, n))
        acc += 2 * (1.0 - lag / (_NW_LAG + 1.0)) * sl
    var_nw = acc / (sxx * sxx)
    return {
        "n_days": n,
        "slope_per_day": round(b, 6),
        "se_ols": round(math.sqrt(var_ols), 6),
        "se_nw": round(math.sqrt(var_nw), 6),
        "t_ols": round(b / math.sqrt(var_ols), 4),
        "t_nw": round(b / math.sqrt(var_nw), 4),
        "se_inflation": round(math.sqrt(var_nw) / math.sqrt(var_ols), 4),
    }


def test_nw_matches_python_reference(spark, tmp_path):
    counts = [5, 9, 4, 12, 8, 15, 7, 18, 11, 22, 13, 25, 16, 9, 21]
    _write_daily_counts(spark, tmp_path, counts)
    want = _nw_py(counts)
    r = q_newey_west_trend_se(spark, str(tmp_path)).collect()[0]
    assert r["nw_lag"] == _NW_LAG
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)


def test_nw_autocorrelated_series_inflates_se(spark, tmp_path):
    # slow wave around a trend: residuals strongly positively
    # autocorrelated -> NW SE must exceed the naive OLS SE
    counts = [int(50 + 2 * i + 30 * math.sin(i / 3.0)) for i in range(24)]
    _write_daily_counts(spark, tmp_path, counts)
    want = _nw_py(counts)
    r = q_newey_west_trend_se(spark, str(tmp_path)).collect()[0]
    assert r["se_inflation"] == want["se_inflation"]
    assert r["se_inflation"] > 1.2
    assert abs(r["t_nw"]) < abs(r["t_ols"])


# --------------------------------------------------------- encoding_win_estimate


def _enc_py(rows):
    cols = {"lang": [], "source": [], "text": []}
    for t, l, s in rows:
        cols["text"].append(t)
        cols["lang"].append(l)
        cols["source"].append(s)
    out = {}
    for c, vs in cols.items():
        n = len(vs)
        dist = sorted(set(vs))
        d = len(dist)
        plain = sum(len(v.encode()) for v in vs)
        dbytes = sum(len(v.encode()) for v in dist)
        bits = max(1.0, math.ceil(math.log2(d)))
        dict_bytes = dbytes + math.ceil(n * bits / 8)
        out[c] = {
            "n_rows": n, "n_distinct": d, "plain_bytes": plain,
            "dict_bytes": dict_bytes,
            "dict_win": round(1.0 - dict_bytes / plain, 4),
        }
    return out


def test_encoding_win_matches_byte_math(spark, tmp_path):
    rows = [("the same body of text", "en", "web")] * 6
    rows += [("another body", "de", "web")] * 3
    rows += [(f"unique text number {i} with padding", "en", "books")
             for i in range(7)]
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    want = _enc_py(rows)
    got = {r["col_name"]: r
           for r in q_encoding_win_estimate(spark, str(tmp_path)).collect()}
    assert set(got) == {"lang", "source", "text"}
    for c, w in want.items():
        for k, v in w.items():
            assert got[c][k] == v, (c, k, got[c][k], v)
    # low-cardinality columns win big; mostly-unique text wins less
    assert got["lang"]["dict_win"] > 0.5
    assert got["source"]["dict_win"] > 0.5
    assert got["text"]["dict_win"] < got["lang"]["dict_win"]
