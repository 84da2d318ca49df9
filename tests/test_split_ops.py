"""Split/containment family on crafted inputs: asymmetric containment
values computed by hand on a known subset pair, cluster-aware split
invariants (members share a split; buckets equal the md5 arithmetic done
independently in Python), and the leakage check's by-construction zero
for the cluster policy vs the hand-computed naive crossing count."""

from __future__ import annotations

import hashlib

import pandas as pd


def _write_documents(spark, path, rows):
    """rows: (doc_id, text)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "crafted"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _bucket(key: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 10


def _split(key: int) -> str:
    b = _bucket(key)
    return "train" if b < 8 else ("val" if b == 8 else "test")


_T1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
_T2 = "red orange yellow green blue indigo violet cyan magenta teal navy rose"


# ----------------------------------------------------------- containment_pairs


def test_containment_subset_pair_by_hand(spark, tmp_path):
    from pdf_extractor_spark.queries import q_containment_pairs

    # doc 1 = doc 0 + one trailing token: 0's 10 shingles all inside 1's 11
    _write_documents(
        spark, tmp_path, [(0, _T1), (1, _T1 + " nu"), (2, _T2), (3, _T2)]
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in q_containment_pairs(spark, str(tmp_path)).collect()
    }
    sub = out[(0, 1)]
    assert sub["cont_a"] == 1.0            # 0 fully contained in 1
    assert sub["jaccard"] == round(10 / 11, 4) == sub["cont_b"]
    assert not sub["engulfed"]             # contained AND jaccard-verified
    ident = out[(2, 3)]
    assert (ident["jaccard"], ident["cont_a"], ident["cont_b"]) == (1.0, 1.0, 1.0)
    assert not ident["engulfed"]


def test_containment_matches_manual_set_math(spark, tmp_path):
    from pdf_extractor_spark.queries import q_containment_pairs

    # two identical halves + unrelated tail on b: candidates via the
    # shared prefix, containment asymmetric by construction
    a = "one two three four five six seven eight nine ten"
    b = a + " x1 y2 z3 w4 v5 u6 t7 s8 r9 q0"
    _write_documents(spark, tmp_path, [(0, a), (1, b)])
    rows = q_containment_pairs(spark, str(tmp_path)).collect()
    if rows:  # candidacy depends on banding; when present, values are exact
        r = rows[0]
        na, nb = 8, 18  # 3-gram counts: 10 tokens -> 8, 20 -> 18
        inter = 8
        assert r["cont_a"] == round(inter / na, 4)
        assert r["cont_b"] == round(inter / nb, 4)
        assert r["jaccard"] == round(inter / (na + nb - inter), 4)
        assert bool(r["engulfed"]) == (
            max(r["cont_a"], r["cont_b"]) >= 0.9 and r["jaccard"] < 0.5
        )


# ----------------------------------------------------------- dedup_aware_split


def test_split_cluster_members_share_split(spark, tmp_path):
    from pdf_extractor_spark.queries import q_dedup_aware_split

    _write_documents(
        spark, tmp_path, [(0, _T1), (1, _T1), (2, _T2), (3, _T2), (4, "solo doc")]
    )
    out = {r["doc_id"]: r for r in q_dedup_aware_split(spark, str(tmp_path)).collect()}
    assert {d: out[d]["cluster_id"] for d in range(5)} == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4}
    for d in range(5):
        cid = out[d]["cluster_id"]
        assert out[d]["bucket"] == _bucket(cid)
        assert out[d]["split"] == _split(cid)
    # the invariant the op exists for: co-clustered docs share a split
    assert out[0]["split"] == out[1]["split"]
    assert out[2]["split"] == out[3]["split"]


# --------------------------------------------------------- split_leakage_check


def test_split_leakage_cluster_policy_is_zero(spark, tmp_path):
    from pdf_extractor_spark.queries import q_split_leakage_check

    _write_documents(
        spark, tmp_path, [(0, _T1), (1, _T1), (2, _T2), (3, _T2), (4, "solo doc")]
    )
    out = {r["policy"]: r for r in q_split_leakage_check(spark, str(tmp_path)).collect()}
    assert set(out) == {"naive", "cluster"}
    # verified edges: (0,1) and (2,3)
    assert out["cluster"]["total_edges"] == out["naive"]["total_edges"] == 2
    assert out["cluster"]["crossing_edges"] == 0
    assert out["cluster"]["leak_rate"] == 0.0
    expect_naive = sum(
        1 for a, b in [(0, 1), (2, 3)] if _split(a) != _split(b)
    )
    assert out["naive"]["crossing_edges"] == expect_naive
    assert out["naive"]["leak_rate"] == round(expect_naive / 2, 4)
