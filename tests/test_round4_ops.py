"""Round-4 operators on crafted inputs: quality-aware canonical dedup,
Gopher-style repetition signals, int8 embedding quantization + quantized
retrieval.  Engine-vs-oracle parity is covered by the contract gate; these
pin the SEMANTICS on inputs small enough to verify by hand."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    q_cosine_topk_int8,
    q_dedup_canonical,
    q_embedding_int8,
    q_repetition_signals,
    select_canonical,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_documents(spark, path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["crafted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, vecs):
    rows = [
        (i, [float(x) for x in v], 0) for i, v in enumerate(vecs)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


# ---------------------------------------------------------------- canonical


def test_select_canonical_longest_wins_tiebreak_min_id(spark):
    labels = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (20, 2), (21, 2), (30, 3)],
        "doc_id bigint, cluster_id bigint",
    )
    docs = spark.createDataFrame(
        [(10, 50), (11, 90), (12, 90), (20, 10), (21, 10), (30, 7)],
        "doc_id bigint, n_chars bigint",
    )
    out = (
        select_canonical(labels, docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    by_doc = out.set_index("doc_id")
    # cluster 1: 11 and 12 tie on n_chars=90 -> lowest doc_id (11) wins
    assert by_doc.loc[11, "canonical_id"] == 11 and bool(by_doc.loc[11, "keep"])
    assert by_doc.loc[12, "canonical_id"] == 11 and not bool(by_doc.loc[12, "keep"])
    assert by_doc.loc[10, "canonical_id"] == 11
    # cluster 2: tie at 10 chars -> doc 20
    assert by_doc.loc[21, "canonical_id"] == 20
    # singleton keeps itself
    assert by_doc.loc[30, "canonical_id"] == 30 and bool(by_doc.loc[30, "keep"])
    assert list(by_doc["cluster_size"]) == [3, 3, 3, 2, 2, 1]
    # exactly one keeper per cluster
    assert out.groupby("cluster_id")["keep"].sum().eq(1).all()


def test_dedup_canonical_end_to_end_exact_duplicates(spark, tmp_path):
    """Two byte-identical docs must cluster and keep exactly one copy;
    the unique doc keeps itself."""
    base = " ".join(f"tok{i % 7} word{i}" for i in range(30))
    _write_documents(spark, str(tmp_path), [base, base, "completely different text here"])
    out = (
        q_dedup_canonical(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    dup = out[out["cluster_id"] == 0]
    assert set(dup["doc_id"]) == {0, 1}
    assert list(dup["canonical_id"]) == [0, 0]  # equal length -> min doc_id
    assert list(dup["keep"]) == [True, False]
    assert list(dup["cluster_size"]) == [2, 2]
    solo = out[out["doc_id"] == 2].iloc[0]
    assert solo["canonical_id"] == 2 and bool(solo["keep"]) and solo["cluster_size"] == 1


# --------------------------------------------------------------- repetition


def test_repetition_signals_hand_counts(spark, tmp_path):
    texts = [
        "a a a a b",                                  # top word 4/5, top bigram "a a" 3/4
        " ".join(f"w{i}" for i in range(20)),         # all-distinct, 20 tokens
        "",                                           # empty
    ]
    _write_documents(spark, str(tmp_path), texts)
    out = (
        q_repetition_signals(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    r0, r1, r2 = out.iloc[0], out.iloc[1], out.iloc[2]
    assert r0["n_tokens"] == 5
    assert r0["top_word_frac"] == pytest.approx(0.8)
    assert r0["top_bigram_frac"] == pytest.approx(0.75)
    assert bool(r0["repetitive"])
    assert r1["n_tokens"] == 20
    assert r1["top_word_frac"] == pytest.approx(0.05)
    assert r1["top_bigram_frac"] == pytest.approx(round(1 / 19, 4))
    assert not bool(r1["repetitive"])
    assert r2["n_tokens"] == 0
    assert r2["top_word_frac"] == 0.0 and r2["top_bigram_frac"] == 0.0
    assert not bool(r2["repetitive"])


# --------------------------------------------------------------------- int8


def test_embedding_int8_codes_and_error_bound(spark, tmp_path):
    _write_embeddings(spark, str(tmp_path), [[1.0, -0.5, 0.25, 0.0]])
    out = q_embedding_int8(spark, str(tmp_path)).toPandas()
    row = out.iloc[0]
    assert row["scale"] == pytest.approx(127.0)
    # floor(x*127 + 0.5): 127, floor(-63.0) = -63, floor(32.25) = 32, 0
    assert row["codes_csv"] == "127,-63,32,0"
    codes = np.array([int(c) for c in row["codes_csv"].split(",")])
    assert (np.abs(codes) <= 127).all()
    # reconstruction error bounded by half a quantization step
    err = np.max(np.abs(np.array([1.0, -0.5, 0.25, 0.0]) - codes / row["scale"]))
    assert row["max_abs_err"] == pytest.approx(round(err, 6))
    assert row["max_abs_err"] <= 0.5 / row["scale"] + 1e-12


def test_embedding_int8_roundtrip_on_real_vectors(spark):
    out = q_embedding_int8(spark, SF_DIR).toPandas()
    # +5e-7: max_abs_err is rounded half-up to 6dp, which can lift it up
    # to half an ulp-of-6dp above the true half-step bound
    assert (out["max_abs_err"] <= 0.5 / out["scale"] + 5e-7).all()
    # every vector quantizes its max-|x| element to exactly +/-127
    tops = out["codes_csv"].map(
        lambda s: max(abs(int(c)) for c in s.split(","))
    )
    assert (tops == 127).all()


def test_cosine_topk_int8_exact_integer_dots(spark, tmp_path):
    _write_embeddings(
        spark,
        str(tmp_path),
        [
            [1.0, 0.0],   # query (vec_id 0)
            [1.0, 0.0],   # identical -> approx_dot 1.0
            [0.0, 1.0],   # orthogonal -> 0
            [0.5, 0.5],   # codes [127,127], scale 254 -> approx 0.5
        ],
    )
    out = q_cosine_topk_int8(spark, str(tmp_path)).toPandas()
    assert list(out["vec_id"]) == [1, 3, 2]
    assert list(out["int_dot"]) == [127 * 127, 127 * 127, 0]
    assert list(out["approx_dot"]) == [1.0, 0.5, 0.0]


def test_cosine_topk_int8_agrees_with_exact_topk(spark):
    """On the real sf0.001 vectors the quantized top-10 must strongly
    overlap the exact float top-10 (int8 on 64 dims loses little): the
    exact top-1 must survive, and overlap >= 8/10."""
    from pdf_extractor_spark.queries import q_cosine_topk

    exact = q_cosine_topk(spark, SF_DIR).toPandas()
    quant = q_cosine_topk_int8(spark, SF_DIR).toPandas()
    assert quant.iloc[0]["vec_id"] == exact.iloc[0]["vec_id"]
    assert len(set(exact["vec_id"]) & set(quant["vec_id"])) >= 8


# ------------------------------------------------------------------ rp-lsh


def test_rp_lsh_identical_vectors_collide_and_verify(spark, tmp_path):
    """Identical vectors share all 16 sign bits (hamming 0) and verify at
    cos 1.0; an orthogonal-ish distinct vector must not pair with them at
    hamming <= 3 unless the signatures genuinely collide."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=64).tolist()
    other = rng.normal(size=64).tolist()
    _write_embeddings(spark, str(tmp_path), [base, base, other])
    from pdf_extractor_spark.queries import q_rp_lsh_pairs

    out = q_rp_lsh_pairs(spark, str(tmp_path)).toPandas()
    dup = out[(out["vec_a"] == 0) & (out["vec_b"] == 1)]
    assert len(dup) == 1
    assert dup.iloc[0]["hamming"] == 0
    assert dup.iloc[0]["cos_sim"] == 1.0
    assert bool(dup.iloc[0]["verified"])


def test_rp_lsh_signature_matches_numpy_reference(spark):
    """The 16-bit signatures must equal a pure-numpy recomputation from
    the same md5-derived hyperplanes over the same int8 codes — pinning
    that the SQL spelling implements Charikar sign-LSH exactly."""
    import hashlib

    from pdf_extractor_spark.queries import _RP_BITS, q_rp_lsh_pairs

    out = q_rp_lsh_pairs(spark, SF_DIR).toPandas()
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    scale = 127.0 / np.maximum(np.abs(V).max(axis=1), 1e-30)
    codes = np.floor(V * scale[:, None] + 0.5).astype(np.int64)
    H = np.array(
        [
            [
                1 if hashlib.md5(f"rp:{b}:{i}".encode()).digest()[0] % 2 == 0 else -1
                for i in range(V.shape[1])
            ]
            for b in range(_RP_BITS)
        ]
    )
    sig = ((codes @ H.T > 0).astype(np.int64) << np.arange(_RP_BITS)).sum(axis=1)
    by_id = dict(zip(emb["vec_id"], sig))
    for _, r in out.iterrows():
        want = bin(int(by_id[r["vec_a"]]) ^ int(by_id[r["vec_b"]])).count("1")
        assert r["hamming"] == want


# ---------------------------------------------------------- semantic dedup


def test_semantic_dedup_keeps_first_prunes_any_later_neardup(spark, tmp_path):
    """Keep-first under vec_id order, and pruning is vs ANY earlier vector
    in the cell (kept or not) — the deterministic SemDeDup spelling: v1 is
    near v0 (pruned), v2 is near only v1 yet is still pruned, v3 is
    orthogonal to everything (kept)."""
    from pdf_extractor_spark.queries import q_semantic_dedup

    v0 = [1.0, 0.0, 0.0, 0.0]
    v1 = [0.999, 0.04, 0.0, 0.0]        # cos(v0,v1) ~ 1
    v2 = [0.5, 0.86, 0.0, 0.0]          # cos(v0,v2)=.5 > threshold .35
    v3 = [0.0, 0.0, 0.0, 1.0]           # orthogonal to all
    _write_embeddings(spark, str(tmp_path), [v0, v1, v2, v3])
    out = (
        q_semantic_dedup(spark, str(tmp_path))
        .orderBy("vec_id")
        .collect()
    )
    keeps = [r["keep"] for r in out]
    assert keeps == [True, False, False, True]
    assert out[0]["max_prior_cos"] == -1.0  # first in cell has no prior
    assert out[1]["max_prior_cos"] >= 0.99


def test_semantic_dedup_cross_cell_vectors_never_compared(spark, tmp_path):
    """Identical vectors in DIFFERENT cells are both kept — pruning is
    strictly cell-local (the IVF-bucketing contract)."""
    from pdf_extractor_spark.queries import q_semantic_dedup

    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 1)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    out = q_semantic_dedup(spark, str(tmp_path)).orderBy("vec_id").collect()
    assert [r["keep"] for r in out] == [True, True]


# ---------------------------------------------------------- sequence pack


def test_sequence_pack_offsets_and_span_math(spark, tmp_path):
    """Hand-checkable packing: token counts cumulate per source in doc_id
    order, seq_id is the chop index, and a doc longer than the budget
    spans the right number of sequences."""
    from pdf_extractor_spark.queries import _PACK_BUDGET, q_sequence_pack

    texts = [
        "alpha beta gamma",          # 3 tokens  -> start 0, seq 0
        "one two",                   # 2 tokens  -> start 3, seq 0
        "tok " * 3000,               # 3000 toks -> start 5, spans 2 seqs
        "tail doc here now",         # 4 tokens  -> start 3005, seq 1
    ]
    _write_documents(spark, str(tmp_path), texts)
    out = {
        r["doc_id"]: r
        for r in q_sequence_pack(spark, str(tmp_path)).collect()
    }
    assert [out[i]["start_offset"] for i in range(4)] == [0, 3, 5, 3005]
    assert out[2]["n_tokens"] == 3000
    assert out[2]["seq_id"] == 0
    # doc 2 covers offsets [5, 3005) -> chops 0 and 1 at budget 2048
    assert out[2]["n_seqs_spanned"] == (5 + 3000 - 1) // _PACK_BUDGET + 1
    assert out[3]["seq_id"] == 3005 // _PACK_BUDGET == 1
    assert out[3]["n_seqs_spanned"] == 1


def test_semantic_dedup_matches_bruteforce_on_random_cells(
    spark, tmp_path, monkeypatch
):
    """Seeded random vectors across several cells: the grouped-GEMM output
    must equal a brute-force per-cell numpy reference exactly (same 4dp
    rounding, same keep rule).  Block size is forced tiny so the
    row-blocked GEMM path (multiple blocks per cell) is what's tested."""
    import pdf_extractor_spark.queries as Q
    from pdf_extractor_spark.queries import _SEMDEDUP_COS, q_semantic_dedup

    monkeypatch.setattr(Q, "_SEMDEDUP_BLOCK", 7)

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], int(i % 3))
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )

    got = {
        r["vec_id"]: r
        for r in q_semantic_dedup(spark, str(tmp_path)).collect()
    }
    by_cell: dict[int, list[tuple[int, np.ndarray]]] = {}
    for vid, vec, lab in rows:
        # same float32 storage round-trip the parquet path applies
        by_cell.setdefault(lab, []).append(
            (vid, np.asarray(vec, dtype=np.float32).astype(np.float64))
        )
    for members in by_cell.values():
        members.sort()
        for i, (vid, v) in enumerate(members):
            prior = -1.0
            for _, u in members[:i]:
                cos = float(
                    np.round(
                        v @ u / (np.linalg.norm(v) * np.linalg.norm(u)), 4
                    )
                )
                prior = max(prior, cos)
            assert got[vid]["max_prior_cos"] == prior, vid
            assert got[vid]["keep"] == (prior < _SEMDEDUP_COS), vid


# -------------------------------------------------------- sentence dedup


def test_sentence_dedup_drops_cross_doc_repeats_keeps_first(spark, tmp_path):
    """First occurrence (lowest doc_id, pos) survives; later repeats drop
    even with different casing; each doc's survivors reassemble in order."""
    from pdf_extractor_spark.queries import q_sentence_dedup

    texts = [
        "Hello world. Goodbye now.",
        "Hello world. Fresh sentence.",
        "HELLO WORLD! Unique bit.",
    ]
    _write_documents(spark, str(tmp_path), texts)
    out = {
        r["doc_id"]: r
        for r in q_sentence_dedup(spark, str(tmp_path)).collect()
    }
    assert out[0]["n_sentences"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["dedup_text"] == "Hello world Goodbye now."
    assert out[1]["n_sentences"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["dedup_text"] == "Fresh sentence."
    # case-insensitive key: "HELLO WORLD" is a repeat of doc 0's opener
    assert out[2]["n_kept"] == 1
    assert out[2]["dedup_text"] == "Unique bit."


def test_sentence_dedup_within_doc_repeat_also_drops(spark, tmp_path):
    from pdf_extractor_spark.queries import q_sentence_dedup

    _write_documents(spark, str(tmp_path), ["Same thing. Same thing. Other."])
    row = q_sentence_dedup(spark, str(tmp_path)).collect()[0]
    assert row["n_sentences"] == 3 and row["n_kept"] == 2
    assert row["dedup_text"] == "Same thing Other."


# ----------------------------------------------------------- mix weights


def test_mix_weights_uniform_rebalance_math(spark, tmp_path):
    """3-token source vs 1-token source: shares .75/.25, uniform weights
    (4/2)/3 and (4/2)/1."""
    from pdf_extractor_spark.queries import q_mix_weights

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["alpha beta gamma", "solo"],
            "lang": ["en", "en"],
            "source": ["big", "small"],
            "n_chars": [16, 4],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r["source"]: r for r in q_mix_weights(spark, str(tmp_path)).collect()}
    assert out["big"]["token_share"] == 0.75
    assert out["small"]["token_share"] == 0.25
    assert out["big"]["uniform_weight"] == pytest.approx(0.6667)
    assert out["small"]["uniform_weight"] == 2.0


# ------------------------------------------- BPE pair counts / epoch shuffle


def test_bpe_pair_counts_hand_weighted_corpus(spark, tmp_path):
    """Sennrich wordcount weighting: 'low' appears twice so its pairs count
    double; ranking is count desc then pair asc (deterministic ties)."""
    from pdf_extractor_spark.queries import q_bpe_pair_counts

    _write_documents(spark, str(tmp_path), ["low low lower", "lowest"])
    rows = q_bpe_pair_counts(spark, str(tmp_path)).collect()
    got = [(r["pair"], r["pair_count"]) for r in rows]
    # low x2 -> lo,ow x2 ; lower -> lo,ow,we,er ; lowest -> lo,ow,we,es,st
    assert got == [
        ("lo", 4), ("ow", 4), ("we", 2), ("er", 1), ("es", 1), ("st", 1),
    ]


def test_bpe_pair_counts_single_char_words_contribute_nothing(spark, tmp_path):
    from pdf_extractor_spark.queries import q_bpe_pair_counts

    _write_documents(spark, str(tmp_path), ["a b c d", "ab"])
    got = [(r["pair"], r["pair_count"])
           for r in q_bpe_pair_counts(spark, str(tmp_path)).collect()]
    assert got == [("ab", 1)]


def test_epoch_shuffle_is_permutation_and_matches_global_sort(spark):
    """global_pos covers exactly 1..N, and ordering rows by global_pos
    reproduces the one-global-sort ORDER BY (shard, md5 key, doc_id) that
    the sharded plan is engineered to avoid."""
    import hashlib

    from pdf_extractor_spark.queries import _EPOCH_SHARDS, q_epoch_shuffle

    rows = q_epoch_shuffle(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r["global_pos"] for r in rows) == list(range(1, n + 1))

    def key(doc_id):
        okey = hashlib.md5(f"epoch0:{doc_id}".encode()).hexdigest()
        # shard applies the engines' md5int macro TO the okey string
        # (a second md5), matching both SQL spellings
        shard = int(hashlib.md5(okey.encode()).hexdigest()[:8], 16) % _EPOCH_SHARDS
        return (shard, okey, doc_id)

    by_pos = [r["doc_id"] for r in sorted(rows, key=lambda r: r["global_pos"])]
    assert by_pos == [d for _, _, d in sorted(key(r["doc_id"]) for r in rows)]
    # shard column itself agrees with the reference hash
    assert all(r["shard"] == key(r["doc_id"])[0] for r in rows)


def test_epoch_shuffle_deterministic_across_runs(spark):
    from pdf_extractor_spark.queries import q_epoch_shuffle

    a = {r["doc_id"]: r["global_pos"] for r in q_epoch_shuffle(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["global_pos"] for r in q_epoch_shuffle(spark, SF_DIR).collect()}
    assert a == b


# --------------------------------------------- ccnet buckets / mix apply


def test_ccnet_buckets_thirds_are_score_ordered(spark):
    """Buckets partition each language by score: every head score <= every
    middle score <= every tail score, and the three thirds are balanced to
    within the tie/boundary slack on real data."""
    from collections import defaultdict

    from pdf_extractor_spark.queries import q_ccnet_buckets

    rows = q_ccnet_buckets(spark, SF_DIR).collect()
    assert rows
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r["lang"]][r["bucket"]].append(r["mean_surprise"])
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        if "head" in buckets and "middle" in buckets:
            assert max(buckets["head"]) <= min(buckets["middle"])
        if "middle" in buckets and "tail" in buckets:
            assert max(buckets["middle"]) <= min(buckets["tail"])
    # equal scores always land in the same bucket
    seen = {}
    for r in rows:
        k = (r["lang"], r["mean_surprise"])
        assert seen.setdefault(k, r["bucket"]) == r["bucket"]


def test_mix_apply_thresholds_and_hash_keep(spark, tmp_path):
    """big source: 9 of 10 tokens -> weight (10/2)/9 = 0.5556 -> 5556 bp;
    small source: capped at 1.0 -> always kept; keep bit reproduces the
    md5 hash rule exactly."""
    import hashlib

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c", "d e f", "g h i", "j"],
            "lang": ["en"] * 4,
            "source": ["big", "big", "big", "small"],
            "n_chars": [5, 5, 5, 1],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from pdf_extractor_spark.queries import q_mix_apply

    out = {r["doc_id"]: r for r in q_mix_apply(spark, str(tmp_path)).collect()}
    assert out[3]["keep_bp"] == 10000 and out[3]["keep"] == 1
    for d in (0, 1, 2):
        assert out[d]["keep_bp"] == 5556
        bucket = int(hashlib.md5(f"mix:{d}".encode()).hexdigest()[:8], 16) % 10000
        assert out[d]["keep"] == int(bucket < 5556)


# --------------------------------------------- gopher filters / dsir


def test_gopher_filters_rule_by_rule(spark, tmp_path):
    from pdf_extractor_spark.queries import q_gopher_filters

    good = " ".join(
        ["the quick brown fox jumps over and that have with lazy dog"] * 6
    )  # 72 words, all alpha, mean len in band, stopwords aplenty
    bullets = "- one thing\n- two thing\n- three thing\nplain line"
    symbols = " ".join(["word### and..."] * 10) + " the of"
    numeric = " ".join(str(i) for i in range(60)) + " the of"
    _write_documents(spark, str(tmp_path), [good, bullets, symbols, numeric])
    out = {r["doc_id"]: r for r in q_gopher_filters(spark, str(tmp_path)).collect()}

    g = out[0]
    assert g["n_words"] == 72 and g["alpha_word_frac"] == 1.0
    assert 3 <= g["mean_word_len"] <= 10
    assert g["symbol_ratio"] == 0.0 and g["n_stopwords"] >= 2
    assert g["passes"] == 1

    b = out[1]
    assert b["bullet_line_frac"] == 0.75  # 3 of 4 lines
    assert b["passes"] == 0  # fails word-count band too

    s = out[2]
    # 20 words; 30 '#' chars + 10 '...' -> 40 symbols / 20 words = 2.0
    assert s["n_words"] == 22
    assert s["symbol_ratio"] == pytest.approx(round(40 / 22, 4))
    assert s["passes"] == 0

    n = out[3]
    assert n["alpha_word_frac"] == pytest.approx(round(2 / 62, 4))
    assert n["passes"] == 0


def test_gopher_filters_ellipsis_lines_and_empty_doc(spark, tmp_path):
    from pdf_extractor_spark.queries import q_gopher_filters

    ell = "this trails off...\nand this one too…\nbut not this"
    _write_documents(spark, str(tmp_path), [ell, ""])
    out = {r["doc_id"]: r for r in q_gopher_filters(spark, str(tmp_path)).collect()}
    assert out[0]["ellipsis_line_frac"] == pytest.approx(round(2 / 3, 4))
    e = out[1]
    assert e["n_words"] == 0 and e["passes"] == 0
    assert e["mean_word_len"] == 0.0 and e["alpha_word_frac"] == 0.0


def test_dsir_weights_target_lookalikes_score_higher(spark, tmp_path):
    """The only in-target doc (>=200 chars) is wall-to-wall 'alpha beta';
    a short doc sharing that bigram must outscore a short doc whose
    bigram the target never contains."""
    from pdf_extractor_spark.queries import q_dsir_weights

    target = "alpha beta " * 25  # 275 chars -> in the 200..50000 band
    _write_documents(
        spark, str(tmp_path), [target, "alpha beta", "zeta omega"]
    )
    out = {r["doc_id"]: r for r in q_dsir_weights(spark, str(tmp_path)).collect()}
    assert out[1]["n_feats"] == 1 and out[2]["n_feats"] == 1
    assert out[1]["dsir_weight"] > out[2]["dsir_weight"]
    # the target doc itself is also a lookalike
    assert out[0]["dsir_weight"] > out[2]["dsir_weight"]


def test_dedup_incremental_verdicts(spark, tmp_path):
    """7 docs, cutoff = floor(6*0.8) = 4 -> arrivals {4,5,6}: doc 6 repeats
    corpus doc 0 (dup_of_corpus), docs 4+5 share a batch-only text (first
    is unique, second dups it in-batch)."""
    from pdf_extractor_spark.queries import q_dedup_incremental

    texts = ["aaa", "bbb", "ccc", "ddd", "eee", "eee", "aaa"]
    _write_documents(spark, str(tmp_path), texts)
    out = {r["doc_id"]: r for r in q_dedup_incremental(spark, str(tmp_path)).collect()}
    assert set(out) == {4, 5, 6}
    assert out[4]["verdict"] == "unique" and out[4]["keeper_doc_id"] == 4
    assert out[5]["verdict"] == "dup_in_batch" and out[5]["keeper_doc_id"] == 4
    assert out[6]["verdict"] == "dup_of_corpus" and out[6]["keeper_doc_id"] == 0


def test_epoch_shuffle_non_contiguous_doc_ids(spark, tmp_path):
    """Permutation + determinism must hold for sparse/huge doc_ids, not
    just the testdata's contiguous range."""
    from pdf_extractor_spark.queries import q_epoch_shuffle

    ids = [3, 17, 256, 99991, 10**12 + 7, 10**12 + 8]
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [f"doc {i}" for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [5] * len(ids),
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    a = q_epoch_shuffle(spark, str(tmp_path)).collect()
    assert sorted(r["global_pos"] for r in a) == list(range(1, len(ids) + 1))
    b = q_epoch_shuffle(spark, str(tmp_path)).collect()
    assert {r["doc_id"]: r["global_pos"] for r in a} == {
        r["doc_id"]: r["global_pos"] for r in b
    }


def test_mix_apply_zero_token_source_keeps_all(spark, tmp_path):
    """A source with no tokens at all must not crash (div-by-zero -> NULL
    -> least() skips it): weight collapses to the cap, everything kept —
    identically in both engines (gate-covered); pinned here explicitly."""
    from pdf_extractor_spark.queries import q_mix_apply

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["real words here", "...", "!!!"],
            "lang": ["en"] * 3,
            "source": ["words", "punct", "punct"],
            "n_chars": [15, 3, 3],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in q_mix_apply(spark, str(tmp_path)).collect()}
    assert out[1]["keep_bp"] == 10000 and out[1]["keep"] == 1
    assert out[2]["keep_bp"] == 10000 and out[2]["keep"] == 1
    # the sole token holder is over-represented (3 of 3 tokens vs a 1.5
    # uniform share) -> downsampled to 0.5
    assert out[0]["keep_bp"] == 5000
