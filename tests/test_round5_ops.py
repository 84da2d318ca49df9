"""Round-5 operator additions on crafted inputs, verified against
independent Python computations (not just the DuckDB oracles the
contract suite replays): hamming_topk / hamming_recall (binary
sign-bit ANN tier), doc_perplexity (corpus unigram-LM scoring),
reservoir_sample (deterministic per-source k-sample),
length_filter_sweep (curation threshold retention curve)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    _HAM_K,
    _HAM_Q,
    q_doc_perplexity,
    q_hamming_recall,
    q_hamming_topk,
    q_length_filter_sweep,
    q_reservoir_sample,
)


def _write_embeddings(spark, path, vecs):
    """vecs: list of (vec_id, [floats])."""
    pdf = pd.DataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs],
        columns=["vec_id", "embedding", "label"],
    )
    spark.createDataFrame(
        pdf, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _signs(v):
    return tuple(1 if x > 0 else 0 for x in v)


def _hamming(a, b):
    return sum(x != y for x, y in zip(_signs(a), _signs(b)))


def _expected_topk(vecs, q_ids, k):
    out = set()
    by_id = dict(vecs)
    for q in q_ids:
        ranked = sorted(
            ((_hamming(by_id[q], v), i) for i, v in vecs if i != q)
        )[:k]
        out.update((q, i, h) for h, i in ranked)
    return out


# ------------------------------------------------------------ hamming_topk


def test_hamming_topk_matches_hand_hamming(spark, tmp_path):
    # 8 vectors over 8 dims with distinct sign patterns; zeros count as
    # non-positive (bit unset) by the x > 0 rule
    vecs = [
        (0, [1, 1, 1, 1, -1, -1, -1, -1]),
        (1, [1, 1, 1, 1, 1, -1, -1, -1]),     # ham(0,1) = 1
        (2, [1, 1, 1, 1, 1, 1, -1, -1]),      # ham(0,2) = 2
        (3, [-1, -1, -1, -1, 1, 1, 1, 1]),    # ham(0,3) = 8
        (4, [1, 1, 1, 1, -1, -1, -1, 0.5]),   # ham(0,4) = 1
        (5, [0.0, 1, 1, 1, -1, -1, -1, -1]),  # ham(0,5) = 1 (0 -> unset)
        (6, [1, -1, 1, -1, 1, -1, 1, -1]),
        (7, [1, 1, 1, 1, -1, -1, -1, -1]),    # ham(0,7) = 0 (exact twin)
    ]
    _write_embeddings(spark, tmp_path, vecs)
    got = {
        (r["query_id"], r["vec_id"], r["hamming"])
        for r in q_hamming_topk(spark, str(tmp_path)).collect()
    }
    want = _expected_topk(vecs, range(_HAM_Q), _HAM_K)
    assert got == want
    # spot-check the rule encodings: 0's twin is vec 7 at distance 0,
    # and vec 5's zero component does not match vec 0's positive bit...
    assert (0, 7, 0) in got
    assert (0, 1, 1) in got and (0, 4, 1) in got and (0, 5, 1) in got


def test_hamming_topk_wide_vectors_multiword(spark, tmp_path):
    # 70 dims forces 3 words of 32/32/6 bits — the packing boundary
    base = [1.0] * 70
    flip_hi = list(base)
    flip_hi[69] = -1.0  # lives in word 3, bit 5
    flip_lo = list(base)
    flip_lo[0] = -1.0   # word 1, bit 0
    far = [-1.0] * 70
    vecs = [(0, base), (1, flip_hi), (2, flip_lo), (3, far),
            (4, base), (5, [1.0] * 35 + [-1.0] * 35)]
    _write_embeddings(spark, tmp_path, vecs)
    got = {
        (r["query_id"], r["vec_id"], r["hamming"])
        for r in q_hamming_topk(spark, str(tmp_path)).collect()
    }
    want = _expected_topk(vecs, range(_HAM_Q), _HAM_K)
    assert got == want
    assert (0, 1, 1) in got and (0, 2, 1) in got  # cross-word flips both = 1


# ---------------------------------------------------------- hamming_recall


def test_hamming_recall_measures_binary_tier_miss(spark, tmp_path):
    """All-positive vectors are hamming-indistinguishable (distance 0
    everywhere -> ties pick lowest vec_ids), while cosine ranks by angle;
    replicate both rankings in python and require the measured recall to
    match exactly."""
    import numpy as np

    rng = [
        (0, [1.0, 0.1, 0.1, 0.1]),
        (1, [0.1, 1.0, 0.1, 0.1]),
        (2, [0.1, 0.1, 1.0, 0.1]),
        (3, [0.1, 0.1, 0.1, 1.0]),
        (4, [1.0, 0.2, 0.1, 0.1]),
        (5, [0.9, 0.1, 0.2, 0.1]),
        (6, [0.1, 0.9, 0.1, 0.2]),
        (7, [0.2, 0.1, 0.9, 0.1]),
        (8, [0.1, 0.2, 0.1, 0.9]),
        (9, [0.5, 0.5, 0.5, 0.5]),
    ]
    _write_embeddings(spark, tmp_path, rng)
    by_id = {i: np.array(v, dtype=np.float32) for i, v in rng}

    def cos_rank(q):
        qv = by_id[q]
        scored = []
        for i, v in by_id.items():
            if i == q:
                continue
            c = float(np.dot(v.astype(np.float64), qv.astype(np.float64)))
            c /= max(
                math.sqrt(float(np.dot(v.astype(np.float64), v.astype(np.float64))))
                * math.sqrt(float(np.dot(qv.astype(np.float64), qv.astype(np.float64)))),
                1e-30,
            )
            scored.append((-round(c, 4), i))
        return [i for _, i in sorted(scored)[:_HAM_K]]

    def ham_rank(q):
        qv = by_id[q]
        return [
            i for _, i in sorted(
                (( _hamming(by_id[i], qv), i) for i in by_id if i != q)
            )[:_HAM_K]
        ]

    want = {
        q: round(len(set(cos_rank(q)) & set(ham_rank(q))) / _HAM_K, 4)
        for q in range(_HAM_Q)
    }
    got = {
        r["query_id"]: r["recall_at_k"]
        for r in q_hamming_recall(spark, str(tmp_path)).collect()
    }
    assert got == want
    # the crafted geometry guarantees the binary tier actually misses
    assert any(v < 1.0 for v in got.values())


# ---------------------------------------------------------- doc_perplexity


def test_doc_perplexity_matches_hand_unigram_model(spark, tmp_path):
    rows = [
        (0, "a a b", "en", "A"),
        (1, "b c", "en", "A"),
    ]
    _write_documents(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r for r in q_doc_perplexity(spark, str(tmp_path)).collect()
    }
    # counts: a=2, b=2, c=1, N=5
    x0 = round((3 * -math.log(2 / 5)) / 3, 4)
    x1 = round((-math.log(2 / 5) - math.log(1 / 5)) / 2, 4)
    assert out[0]["n_tokens"] == 3 and out[0]["xent_nats"] == pytest.approx(x0)
    assert out[1]["n_tokens"] == 2 and out[1]["xent_nats"] == pytest.approx(x1)
    assert not out[0]["high_surprise"] and not out[1]["high_surprise"]


def test_doc_perplexity_flags_rare_token_doc(spark, tmp_path):
    # N = 2001 -> the singleton doc scores ln(2001) ~ 7.60 > 7.0
    rows = [
        (0, " ".join(["x"] * 2000), "en", "A"),
        (1, "zzz", "en", "A"),
    ]
    _write_documents(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r for r in q_doc_perplexity(spark, str(tmp_path)).collect()
    }
    assert out[1]["xent_nats"] == pytest.approx(round(math.log(2001), 4))
    assert bool(out[1]["high_surprise"])
    assert not bool(out[0]["high_surprise"])


def test_doc_perplexity_skips_empty_token_docs(spark, tmp_path):
    rows = [(0, "hello world", "en", "A"), (1, "!!! ...", "en", "A")]
    _write_documents(spark, tmp_path, rows)
    out = q_doc_perplexity(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in out] == [0]


# -------------------------------------------------------- reservoir_sample


def test_reservoir_sample_is_md5_order_and_stable(spark, tmp_path):
    rows = [(i, "x" * 10, "en", "A" if i < 12 else "B") for i in range(20)]
    _write_documents(spark, tmp_path, rows)

    def expect(ids):
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(f"{i}:rsv".encode()).hexdigest(), i)
        )
        return [(i, k + 1) for k, i in enumerate(ranked[:5])]

    got = sorted(
        (r["source"], r["doc_id"], r["pick_order"])
        for r in q_reservoir_sample(spark, str(tmp_path)).collect()
    )
    want = sorted(
        [("A", i, o) for i, o in expect(range(12))]
        + [("B", i, o) for i, o in expect(range(12, 20))]
    )
    assert got == want
    # determinism: a second run returns the identical sample
    again = sorted(
        (r["source"], r["doc_id"], r["pick_order"])
        for r in q_reservoir_sample(spark, str(tmp_path)).collect()
    )
    assert again == got


def test_reservoir_sample_small_stratum_returns_all(spark, tmp_path):
    rows = [(i, "x" * 10, "en", "tiny") for i in range(3)]
    _write_documents(spark, tmp_path, rows)
    out = q_reservoir_sample(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert sorted(r["pick_order"] for r in out) == [1, 2, 3]


# ----------------------------------------------------- length_filter_sweep


def test_length_filter_sweep_hand_counts(spark, tmp_path):
    lengths = [10, 60, 120, 300, 800]
    rows = [(i, "x" * n, "en", "A") for i, n in enumerate(lengths)]
    _write_documents(spark, tmp_path, rows)
    out = {
        r["min_chars"]: r
        for r in q_length_filter_sweep(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 50, 100, 150, 200, 250, 300, 400, 500, 750}
    total = sum(lengths)
    assert out[0]["docs_kept"] == 5 and out[0]["doc_retention"] == 1.0
    assert out[100]["docs_kept"] == 3
    assert out[100]["chars_kept"] == 120 + 300 + 800
    assert out[100]["char_retention"] == pytest.approx(
        round((120 + 300 + 800) / total, 4)
    )
    assert out[750]["docs_kept"] == 1 and out[750]["chars_kept"] == 800
    assert all(out[t]["docs_total"] == 5 for t in out)


def test_length_filter_sweep_monotone_retention(spark, tmp_path):
    rows = [(i, "x" * (20 * (i + 1)), "en", "A") for i in range(30)]
    _write_documents(spark, tmp_path, rows)
    out = sorted(
        q_length_filter_sweep(spark, str(tmp_path)).collect(),
        key=lambda r: r["min_chars"],
    )
    kept = [r["docs_kept"] for r in out]
    assert kept == sorted(kept, reverse=True)
    assert all(
        r["char_retention"] >= r["doc_retention"] - 1e-9 for r in out
    )  # long docs survive cuts disproportionately


# ------------------------------------------------------ source_dedup_matrix


def test_source_dedup_matrix_hand_counts_and_zero_grid(spark, tmp_path):
    from pdf_extractor_spark.queries import q_source_dedup_matrix

    rows = [
        (0, "hello dup one", "en", "A"),
        (1, "hello dup one", "en", "B"),
        (2, "world dup two", "en", "A"),
        (3, "world dup two", "en", "B"),
        (4, "world dup two", "en", "C"),
        (5, "solo text", "en", "A"),
        (6, "only in d", "en", "D"),
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared_groups"], r["dup_mass"])
        for r in q_source_dedup_matrix(spark, str(tmp_path)).collect()
    }
    # full 4-source grid: C(4,2) = 6 rows, zero-filled where no overlap
    assert len(got) == 6
    assert got[("A", "B")] == (2, 2 + 3)   # hello(2 copies) + world(3)
    assert got[("A", "C")] == (1, 3)
    assert got[("B", "C")] == (1, 3)
    assert got[("A", "D")] == (0, 0)
    assert got[("B", "D")] == (0, 0)
    assert got[("C", "D")] == (0, 0)


# ----------------------------------------------------------------- lsh_recall


def test_lsh_recall_exact_dups_caught_unrelated_not(spark, tmp_path):
    from pdf_extractor_spark.queries import q_lsh_recall

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen")
    fillers = [
        "red green blue yellow purple orange cyan magenta lime teal",
        "cat dog bird fish horse cow sheep goat pig duck",
        "north south east west up down left right front back",
        "jan feb mar apr may jun jul aug sep oct nov dec",
    ]
    rows = [
        (0, base, "en", "A"),
        (1, base, "en", "A"),      # adjacent exact dup: j = 1.0
        (2, other, "en", "A"),
        (3, other, "en", "A"),     # second exact-dup adjacent pair
        (4, fillers[0], "en", "A"),
        (5, fillers[1], "en", "A"),
        (6, fillers[2], "en", "A"),
        (7, fillers[3], "en", "A"),
    ]
    _write_documents(spark, tmp_path, rows)
    out = {
        r["j_bucket"]: r for r in q_lsh_recall(spark, str(tmp_path)).collect()
    }
    # identical adjacent docs land in bucket 10 and MUST be caught: same
    # shingles -> same signatures -> same band buckets (perfect recall at
    # j=1 by construction)
    assert out[10]["n_pairs"] == 2
    assert out[10]["n_caught"] == 2 and out[10]["catch_rate"] == 1.0
    # disjoint-vocab adjacent pairs sit in bucket 0 with ~zero catch rate
    assert out[0]["n_pairs"] == 5
    assert out[0]["catch_rate"] <= 0.2


# ------------------------------------- materialize-once fan-out side tables


def test_cluster_family_side_tables_equal_self_contained(spark):
    """Production materializes the verified-pair table / cluster labels /
    canonical table ONCE and fans them out; every side-table path must
    return exactly what the self-contained path returns."""
    from pdf_extractor_spark.queries import (
        q_cluster_size_histogram,
        q_dedup_canonical,
        q_dedup_clusters_verified,
        q_dedup_savings,
        q_near_dup_verified,
    )

    sf = "/root/testdata/sf0.001"

    edges = (
        q_near_dup_verified(spark, sf)
        .where("verified")
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    labels = q_dedup_clusters_verified(spark, sf, edges=edges).localCheckpoint(
        eager=True
    )
    canon = q_dedup_canonical(spark, sf, labels=labels).localCheckpoint(
        eager=True
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(labels) == rows(q_dedup_clusters_verified(spark, sf))
    assert rows(canon) == rows(q_dedup_canonical(spark, sf))
    assert rows(q_cluster_size_histogram(spark, sf, labels=labels)) == rows(
        q_cluster_size_histogram(spark, sf)
    )
    assert rows(q_dedup_savings(spark, sf, canon=canon)) == rows(
        q_dedup_savings(spark, sf)
    )


# ---------------------------------------------------- semantic_threshold_sweep


def test_semantic_threshold_sweep_hand_geometry(spark, tmp_path):
    """Vectors at controlled angles inside one cell: cos(0,1)=1.0,
    cos with the orthogonal vector = 0.0, and a ~0.707 pair — the sweep
    counts must step exactly at the thresholds the geometry dictates."""
    from pdf_extractor_spark.queries import q_semantic_threshold_sweep

    vecs = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),          # cos(0,1) = 1.0
        (2, [0.0, 1.0]),          # orthogonal to 0/1: cos = 0.0 (< 0.3 floor)
        (3, [1.0, 1.0]),          # cos vs 0/1 = 0.7071, vs 2 = 0.7071
    ]
    pdf = pd.DataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs],
        columns=["vec_id", "embedding", "label"],
    )
    spark.createDataFrame(
        pdf, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    out = {
        r["threshold"]: (r["n_pairs"], r["n_docs"])
        for r in q_semantic_threshold_sweep(spark, str(tmp_path)).collect()
    }
    assert len(out) == 8
    # pairs >= 0.3: (0,1)=1.0, (0,3)=(1,3)=(2,3)=0.7071 -> 4 pairs, all docs
    assert out[0.3] == (4, 4) and out[0.7] == (4, 4)
    # above 0.7071: only the identical pair remains
    assert out[0.8] == (1, 2) and out[0.9] == (1, 2) and out[0.95] == (1, 2)


def test_semantic_threshold_sweep_empty_grid_zero_filled(spark, tmp_path):
    """No qualifying pairs (different labels) -> all 8 thresholds present
    with zero counts, not an empty table."""
    from pdf_extractor_spark.queries import q_semantic_threshold_sweep

    pdf = pd.DataFrame(
        [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 1)],
        columns=["vec_id", "embedding", "label"],
    )
    spark.createDataFrame(
        pdf, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = q_semantic_threshold_sweep(spark, str(tmp_path)).collect()
    assert len(out) == 8
    assert all(r["n_pairs"] == 0 and r["n_docs"] == 0 for r in out)


# ------------------------------------------------------------ pack_efficiency


def test_pack_efficiency_hand_math(spark, tmp_path):
    from pdf_extractor_spark.queries import q_pack_efficiency

    # source A: 3 docs x 400 tokens = 1200 total; source B: 1 doc x 100
    rows = [(i, " ".join(["tok"] * 400), "en", "A") for i in range(3)]
    rows.append((3, " ".join(["tok"] * 100), "en", "B"))
    _write_documents(spark, tmp_path, rows)
    out = {
        (r["source"], r["budget"]): r
        for r in q_pack_efficiency(spark, str(tmp_path)).collect()
    }
    assert len(out) == 8  # 2 sources x 4 budgets
    a512 = out[("A", 512)]
    # ceil(1200/512) = 3 sequences -> 3*512 - 1200 = 336 pad tokens
    assert a512["total_tokens"] == 1200
    assert a512["n_sequences"] == 3 and a512["pad_tokens"] == 336
    assert a512["waste_rate"] == pytest.approx(round(336 / 1200, 4))
    a4096 = out[("A", 4096)]
    assert a4096["n_sequences"] == 1 and a4096["pad_tokens"] == 4096 - 1200
    b512 = out[("B", 512)]
    assert b512["n_sequences"] == 1 and b512["pad_tokens"] == 412
    # small budgets always waste less under concat-and-chop
    assert a512["waste_rate"] < a4096["waste_rate"]


# ---------------------------------------------------------------- mix_schedule


def test_mix_schedule_bresenham_hand_math(spark, tmp_path):
    """Exact-double weights (300/400 = 0.75, 100/400 = 0.25): the
    low-discrepancy rule fires A at every step except n % 4 == 1 and B at
    multiples of 4; every prefix tracks the share within one pick."""
    from pdf_extractor_spark.queries import q_mix_schedule

    rows = [(0, " ".join(["t"] * 300), "en", "A"),
            (1, " ".join(["t"] * 100), "en", "B")]
    _write_documents(spark, tmp_path, rows)
    out = q_mix_schedule(spark, str(tmp_path)).collect()
    a_steps = sorted(r["step"] for r in out if r["source"] == "A")
    b_steps = sorted(r["step"] for r in out if r["source"] == "B")
    assert len(a_steps) == 150 and len(b_steps) == 50  # floor(200 * w)
    assert a_steps[:4] == [2, 3, 4, 6] and b_steps[:3] == [4, 8, 12]
    assert all(n % 4 == 0 for n in b_steps)
    # prefix discrepancy bound: |picks_k(n) - n*w_k| < 1 at every step
    for n in range(1, 201):
        assert abs(sum(1 for s in a_steps if s <= n) - n * 0.75) < 1
        assert abs(sum(1 for s in b_steps if s <= n) - n * 0.25) < 1
    # pick_idx is the per-source running count
    idx = {(r["source"], r["step"]): r["pick_idx"] for r in out}
    assert idx[("B", 4)] == 1 and idx[("B", 8)] == 2


def test_mix_schedule_zero_token_source_never_fires(spark, tmp_path):
    from pdf_extractor_spark.queries import q_mix_schedule

    rows = [(0, " ".join(["t"] * 50), "en", "A"), (1, "!!!", "en", "empty")]
    _write_documents(spark, tmp_path, rows)
    out = q_mix_schedule(spark, str(tmp_path)).collect()
    assert all(r["source"] == "A" for r in out)
    assert len(out) == 200  # w_A = 1.0 -> fires every step


# ---------------------------------------------------------- minhash_perm_sweep


def test_minhash_perm_sweep_error_shrinks_with_permutations(spark, tmp_path):
    """Identical adjacent docs estimate j=1 exactly at every k (error 0);
    unrelated docs' max error can only shrink or hold as k grows; the
    3-row report carries one row per permutation budget."""
    from pdf_extractor_spark.queries import q_minhash_perm_sweep

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (0, base, "en", "A"),
        (1, base, "en", "A"),                 # j = 1.0 -> est 1.0 at any k
        (2, "one two three four five six seven eight nine ten", "en", "A"),
        (3, "red green blue yellow purple orange cyan magenta", "en", "A"),
    ]
    _write_documents(spark, tmp_path, rows)
    out = {r["n_perms"]: r for r in q_minhash_perm_sweep(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 4, 8}
    assert all(out[k]["n_pairs"] == 3 for k in out)
    # the identical pair contributes zero error at every budget, so the
    # MAE is bounded by the two disjoint pairs' est (their exact_j ~ 0,
    # est can only be 0 or a false 1/k agreement)
    for k in (2, 4, 8):
        assert 0.0 <= out[k]["mae"] <= 1.0
        assert out[k]["max_abs_err"] <= 1.0
    # more permutations never raise the worst-case estimation error here
    assert out[8]["max_abs_err"] <= out[2]["max_abs_err"] + 1e-9


# ----------------------------------------------------------- source_ks_anomaly


def test_source_ks_anomaly_flags_shifted_source(spark, tmp_path):
    """Two sources share one length distribution; a third is uniformly
    5x longer — its KS distance vs the rest must approach 1 and flag,
    while the matched sources stay low and unflagged.  Hand-check the
    exact KS value via a python ECDF replication."""
    from pdf_extractor_spark.queries import q_source_ks_anomaly

    rows = []
    i = 0
    for src in ("A", "B"):
        for k in range(40):
            rows.append((i, "x" * (100 + (k % 10)), "en", src)); i += 1
    # C is a small feed (4 docs) of 5x-longer pages: its KS vs the rest is
    # 1.0 and flags; A/B each differ from "the rest" only by C's 4 docs
    # (gap 4/44 ~ 0.09, far under the 0.297 critical value)
    for k in range(4):
        rows.append((i, "x" * (500 + k), "en", "C")); i += 1
    _write_documents(spark, tmp_path, rows)
    out = {r["source"]: r for r in q_source_ks_anomaly(spark, str(tmp_path)).collect()}

    lengths = {"A": [], "B": [], "C": []}
    for _i, t, _l, s in rows:
        lengths[s].append(len(t))

    def ks(src):
        mine = sorted(lengths[src])
        rest = sorted(v for s2, vs in lengths.items() if s2 != src for v in vs)
        pts = sorted(set(mine + rest))
        return round(max(
            abs(sum(v <= p for v in mine) / len(mine)
                - sum(v <= p for v in rest) / len(rest))
            for p in pts
        ), 4)

    assert out["A"]["n_docs"] == 40 and out["C"]["n_docs"] == 4
    for src in ("A", "B", "C"):
        assert out[src]["ks_d"] == pytest.approx(ks(src))
    assert bool(out["C"]["anomalous"])
    assert not bool(out["A"]["anomalous"]) and not bool(out["B"]["anomalous"])
    assert out["C"]["ks_d"] == 1.0


# -------------------------------------------------------------------- heaps_law


def test_heaps_law_linear_vocab_growth_beta_one(spark, tmp_path):
    """Every doc introduces exactly 5 NEW tokens and nothing else:
    V(N) = N exactly, so the fitted Heaps exponent must be 1.0 and each
    decile row must carry the hand-computable vocab/token counts."""
    from pdf_extractor_spark.queries import q_heaps_law

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(5)), "en", "A")
        for i in range(20)
    ]
    _write_documents(spark, tmp_path, rows)
    out = sorted(
        q_heaps_law(spark, str(tmp_path)).collect(),
        key=lambda r: r["prefix_decile"],
    )
    assert len(out) == 10
    for r in out:
        # cut = ceil(19 * k / 10); docs included = cut + 1 (doc_ids 0..cut)
        docs = r["cut_doc_id"] + 1
        assert r["n_tokens"] == 5 * docs
        assert r["vocab"] == 5 * docs
        assert r["heaps_beta"] == pytest.approx(1.0)


def test_heaps_law_saturated_vocab_beta_zero(spark, tmp_path):
    """All docs reuse one fixed 5-token vocabulary: V is constant across
    prefixes, so beta must be 0.0."""
    from pdf_extractor_spark.queries import q_heaps_law

    rows = [(i, "a b c d e", "en", "A") for i in range(20)]
    _write_documents(spark, tmp_path, rows)
    out = q_heaps_law(spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert all(r["vocab"] == 5 for r in out)
    assert all(r["heaps_beta"] == pytest.approx(0.0) for r in out)
