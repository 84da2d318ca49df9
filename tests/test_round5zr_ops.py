"""Round-5 batch-46 operators on crafted inputs, verified against
independent Python computations: script_mix_profile (unicode class
shares), encoding_residue_audit (mojibake/entity/control/U+FFFD
flags), clustering_validity (Davies-Bouldin, Calinski-Harabasz,
simplified silhouette)."""

from __future__ import annotations

from pdf_extractor_spark.queries import (
    q_clustering_validity,
    q_encoding_residue_audit,
    q_script_mix_profile,
)


def _write_docs(spark, path, rows):
    """rows: (text, source)"""
    spark.createDataFrame(
        [(i + 1, t, "en", s, len(t) if t else 0)
         for i, (t, s) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, vector, label)"""
    spark.createDataFrame(
        [(i, [float(x) for x in v], int(lb)) for i, v, lb in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


# ------------------------------------------------------ script_mix_profile


def test_script_mix_counts_by_class(spark, tmp_path):
    # 3 latin + 1 space + 3 digits = 7 chars
    _write_docs(spark, tmp_path, [
        ("abc 123", "s1"),
        ("中文", "s2"),              # 2 CJK chars
        ("аб ٠", "s3"),       # 2 cyrillic, 1 space, 1 arabic
    ])
    out = {r["source"]: r
           for r in q_script_mix_profile(spark, str(tmp_path)).collect()}
    s1 = out["s1"]
    assert s1["n_chars_total"] == 7
    assert s1["latin_share"] == round(3 / 7, 4)
    assert s1["digit_share"] == round(3 / 7, 4)
    assert s1["space_share"] == round(1 / 7, 4)
    assert s1["cjk_share"] == 0.0 and s1["other_share"] == 0.0
    s2 = out["s2"]
    assert s2["cjk_share"] == 1.0 and s2["latin_share"] == 0.0
    s3 = out["s3"]
    assert s3["cyrillic_share"] == 0.5
    assert s3["arabic_share"] == 0.25
    assert s3["space_share"] == 0.25


def test_script_mix_other_bucket_and_null_text(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        ("éé!!", "s"),   # accented latin + punct -> all "other"
        (None, "s"),
    ])
    row = q_script_mix_profile(spark, str(tmp_path)).collect()[0]
    assert row["n_docs"] == 2
    assert row["n_chars_total"] == 4
    assert row["other_share"] == 1.0


# -------------------------------------------------- encoding_residue_audit


def test_encoding_residue_flags_each_family(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        ("cafÃ© menu", "moj"),          # mojibake 'Ã©'
        ("a â€™ quote", "moj"),    # mojibake 'â€™'
        ("five &amp; six &#8217; end", "ent"),    # entities
        ("bad\x01byte", "ctl"),                   # control char
        ("lost � here", "rep"),              # replacement char
        ("perfectly clean prose", "ok"),
        ("also clean", "ok"),
    ])
    out = {r["source"]: r for r in
           q_encoding_residue_audit(spark, str(tmp_path)).collect()}
    assert out["moj"]["mojibake_docs"] == 2
    assert out["moj"]["any_residue_share"] == 1.0
    assert out["ent"]["entity_docs"] == 1
    assert out["ent"]["mojibake_docs"] == 0
    assert out["ctl"]["control_docs"] == 1
    assert out["rep"]["replacement_docs"] == 1
    ok = out["ok"]
    assert (ok["mojibake_docs"], ok["entity_docs"], ok["control_docs"],
            ok["replacement_docs"]) == (0, 0, 0, 0)
    assert ok["any_residue_share"] == 0.0


def test_encoding_residue_tab_newline_not_control(spark, tmp_path):
    _write_docs(spark, tmp_path, [("tab\there\nand cr\r done", "s")])
    row = q_encoding_residue_audit(spark, str(tmp_path)).collect()[0]
    assert row["control_docs"] == 0


# ----------------------------------------------------- clustering_validity


def test_clustering_validity_two_separated_clusters(spark, tmp_path):
    dim = 4
    pts = [
        (1, [0, 0, 0, 0], 0), (2, [2, 0, 0, 0], 0),
        (3, [10, 0, 0, 0], 1), (4, [12, 0, 0, 0], 1),
    ]
    _write_embeddings(spark, tmp_path,
                      [(i, v + [0] * (dim - len(v)), lb)
                       for i, v, lb in pts])
    row = q_clustering_validity(spark, str(tmp_path)).collect()[0]
    # centroids (1,..) and (11,..): S_i = 1, M = 10
    assert (row["k_clusters"], row["n_vecs"]) == (2, 4)
    assert row["db_index"] == round((1 + 1) / 10, 4)
    assert row["within_ss"] == 4.0          # four unit squared distances
    assert row["between_ss"] == 100.0       # 2*(5^2) + 2*(5^2)
    # CH = (B/(k-1)) / (W/(n-k)) = 100 / 2
    assert row["ch_index"] == 50.0
    sil = (((11 - 1) / 11) + ((9 - 1) / 9)) * 2 / 4
    assert row["silhouette"] == round(sil, 4)


def test_clustering_validity_single_cluster_degenerate(spark, tmp_path):
    _write_embeddings(spark, tmp_path, [
        (1, [0.0, 0.0], 7), (2, [2.0, 0.0], 7),
    ])
    row = q_clustering_validity(spark, str(tmp_path)).collect()[0]
    assert row["k_clusters"] == 1
    assert row["db_index"] is None and row["ch_index"] is None
    assert row["silhouette"] == 0.0
    assert row["within_ss"] == 2.0 and row["between_ss"] == 0.0
