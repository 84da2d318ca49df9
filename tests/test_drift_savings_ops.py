"""Embedding drift, cluster-size histogram, and dedup savings on crafted
inputs: orthogonal/collinear parity means with analytically known cosine,
a hand-built cluster layout, and per-source removal accounting where the
longest-copy-wins rule decides exactly which characters are saved."""

from __future__ import annotations

import pandas as pd


def _write_embeddings(spark, path, rows, dim=64):
    """rows: (vec_id, dense_map {dim_index: value}, label)."""
    data = []
    for vec_id, dense, label in rows:
        v = [0.0] * dim
        for i, x in dense.items():
            v[i] = float(x)
        data.append((vec_id, v, label))
    spark.createDataFrame(
        data, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------------ embedding_drift


def test_drift_orthogonal_parity_means(spark, tmp_path):
    from pdf_extractor_spark.queries import q_embedding_drift

    _write_embeddings(
        spark,
        tmp_path,
        [
            (0, {0: 1.0}, 0), (2, {0: 1.0}, 0),   # even mean = e0
            (1, {1: 1.0}, 0), (3, {1: 1.0}, 0),   # odd mean = e1
        ],
    )
    r = q_embedding_drift(spark, str(tmp_path)).collect()[0]
    assert (r["n_even"], r["n_odd"]) == (2, 2)
    assert r["mean_cosine"] == 0.0
    assert (r["norm_even"], r["norm_odd"]) == (1.0, 1.0)
    assert r["max_dim_shift"] == 1.0


def test_drift_collinear_means_cosine_one(spark, tmp_path):
    from pdf_extractor_spark.queries import q_embedding_drift

    _write_embeddings(
        spark,
        tmp_path,
        [
            (0, {0: 2.0}, 0), (2, {0: 4.0}, 0),   # even mean = 3*e0
            (1, {0: 1.0}, 0),                      # odd mean = 1*e0
        ],
    )
    r = q_embedding_drift(spark, str(tmp_path)).collect()[0]
    assert (r["n_even"], r["n_odd"]) == (2, 1)
    assert r["mean_cosine"] == 1.0
    assert (r["norm_even"], r["norm_odd"]) == (3.0, 1.0)
    assert r["max_dim_shift"] == 2.0


# ----------------------------------------------------- cluster_size_histogram


_D1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
_D2 = "red orange yellow green blue indigo violet cyan magenta teal navy rose"


def test_cluster_size_histogram_by_hand(spark, tmp_path):
    from pdf_extractor_spark.queries import q_cluster_size_histogram

    _write_documents(
        spark,
        tmp_path,
        [(0, _D1, "s"), (1, _D1, "s"), (2, _D2, "s"), (3, _D2, "s"), (4, "solo", "s")],
    )
    out = {r["cluster_size"]: r for r in q_cluster_size_histogram(spark, str(tmp_path)).collect()}
    assert out[1]["n_clusters"] == 1 and out[1]["n_docs"] == 1
    assert out[1]["doc_share"] == 0.2
    assert out[2]["n_clusters"] == 2 and out[2]["n_docs"] == 4
    assert out[2]["doc_share"] == 0.8
    assert set(out) == {1, 2}


# -------------------------------------------------------------- dedup_savings


def test_dedup_savings_longest_copy_kept(spark, tmp_path):
    from pdf_extractor_spark.queries import q_dedup_savings

    long_copy = _D1 + " nu"          # longer duplicate — kept
    _write_documents(
        spark,
        tmp_path,
        [(0, _D1, "s1"), (1, long_copy, "s1"), (2, "unique text here", "s2")],
    )
    out = {r["source"]: r for r in q_dedup_savings(spark, str(tmp_path)).collect()}
    s1 = out["s1"]
    assert (s1["n_docs"], s1["n_kept"], s1["n_removed"]) == (2, 1, 1)
    assert s1["chars_total"] == len(_D1) + len(long_copy)
    assert s1["chars_removed"] == len(_D1)   # the shorter copy goes
    assert s1["doc_removal_rate"] == 0.5
    s2 = out["s2"]
    assert (s2["n_removed"], s2["chars_removed"], s2["doc_removal_rate"]) == (0, 0, 0.0)
