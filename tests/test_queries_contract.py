"""Replicates the driver's CORRECTNESS gate locally: every registry query
runs on Spark AND its oracle SQL on DuckDB over the same parquet tables;
row counts, column names and (order-insensitive) values must agree.

Runs at sf0.001 for speed; the driver repeats this at sf0.01.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from pdf_extractor_spark.queries import QUERY_REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

ORACLE_QUERIES = [(n, f, s) for n, (f, s) in QUERY_REGISTRY.items() if s]
ROWS_ONLY_QUERIES = [(n, f) for n, (f, s) in QUERY_REGISTRY.items() if not s]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Totally-ordered normalization: every value becomes a (not-null, value)
    pair so rows containing SQL NULLs still sort (None < any value) without
    conflating None with '' or 0."""
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (1, round(v, 6))
    if isinstance(v, datetime.datetime):
        return (1, v.replace(tzinfo=None).isoformat())
    if isinstance(v, list):
        return (1, tuple(_norm(x) for x in v))
    return (1, v)


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(_norm(row[i]) for i in order) for row in rel.fetchall()
    )
    return sorted(cols), rows


@pytest.mark.parametrize("name,fn,sql", ORACLE_QUERIES, ids=[n for n, *_ in ORACLE_QUERIES])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    got_cols, got = _spark_rows(fn(spark, SF_DIR))
    want_cols, want = _duck_rows(duck, sql)
    assert got_cols == want_cols, f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch (first diff: "\
        f"{next(((a, b) for a, b in zip(got, want) if a != b), None)})"


@pytest.mark.parametrize("name,fn", ROWS_ONLY_QUERIES, ids=[n for n, _ in ROWS_ONLY_QUERIES])
def test_rows_only_query_runs(spark, name, fn):
    df = fn(spark, SF_DIR)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_min_label_propagation_pointer_doubling(spark):
    """A 33-node chain (diameter 32) must converge in O(log diameter)
    rounds — pointer doubling gives <= ~7; plain neighbor propagation
    would need 32 and trip the max_iters guard at corpus scale."""
    from pdf_extractor_spark.queries import propagate_min_labels

    n = 33
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a int, doc_b int"
    )
    labels, iters = propagate_min_labels(docs, pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in labels.collect()}
    assert all(rows[i][0] == 0 for i in range(n))
    assert rows[0][1] and not any(rows[i][1] for i in range(1, n))
    assert iters <= 8, f"chain took {iters} rounds — doubling regressed"


def test_min_label_propagation_raises_on_budget_exhaustion(spark):
    from pdf_extractor_spark.queries import propagate_min_labels

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a int, doc_b int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        propagate_min_labels(docs, pairs, max_iters=1)


def test_verified_clusters_respect_verified_edges_only(spark):
    """dedup_clusters_verified must separate docs whose only connection is
    a REFUTED candidate edge: every verified edge joins a cluster, every
    refuted-only pair stays apart."""
    from pdf_extractor_spark.queries import (
        q_dedup_clusters_verified,
        q_near_dup_verified,
    )

    edges = q_near_dup_verified(spark, SF_DIR).collect()
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in q_dedup_clusters_verified(spark, SF_DIR).collect()
    }
    assert any(not e["verified"] for e in edges), "fixture lost its refuted pairs"
    for e in edges:
        if e["verified"]:
            assert labels[e["doc_a"]] == labels[e["doc_b"]], \
                f"verified edge {e['doc_a']}-{e['doc_b']} split across clusters"
