"""Round-5 batch-4 operators on crafted inputs, verified against
independent Python computations (not just the DuckDB oracles the contract
suite replays): token_budget_plan (epoch allocation under a budget with
the 4-epoch repeat cap), shard_balance (token balance of the 64-way hash
sharding), embedding_norm_profile (per-label L2-norm health probe);
batch 5: embedding_dim_stats (dead/low-variance dimension audit),
centroid_confusion (nearest-centroid label purity matrix),
perplexity_prune_sweep (retention grid over unigram-LM cutoffs);
batch 6: embedding_dup_stats (bit-identical vector audit), canary_phrases
(boilerplate/model-leak watchlist scan), inter_event_gap_profile
(per-type inter-arrival percentiles); batch 7: split_ngram_leakage
(8-gram train/val leak rate), filter_lang_bias (curation-gate fairness
by language), lsh_band_balance (bucket-size audit / verify cost model);
batch 8: turn_length_progression (token curve over conversation depth),
conv_repeated_openers (retry-loop detection), turn_token_outliers
(paste-bomb detection via per-conv 3σ); batch 9: centroid_separation
(pairwise label-centroid cosine), shuffle_run_audit (same-source islands
in the shuffled order), source_lang_matrix (composition census);
batch 10: corpus_health_scorecard (one-scan GROUPING SETS dashboard);
batch 11: lsh_precision (verify-survival rate of LSH candidates),
dup_arrival_span (dedup-cache TTL evidence), vocab_prune_plan
(min-df vocabulary pruning sweep); batch 12: asof_join_tolerance
(merge_asof tolerance semantics vs DuckDB native ASOF),
canonical_policy_delta (keep-longest vs keep-first ablation),
window_load_percentiles (capacity envelope of 5-min loads)."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from pdf_extractor_spark.queries import (
    _BUDGET_MULT,
    _MAX_EPOCHS,
    _N_SHARDS,
    q_embedding_norm_profile,
    q_shard_balance,
    q_token_budget_plan,
)


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, list[float], label)."""
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


# --------------------------------------------------------- token_budget_plan


def test_token_budget_plan_sqrt_shares_and_cap(spark, tmp_path):
    # big source: 64 tokens; small source: 4 tokens.
    # sqrt shares: 8/(8+2)=0.8 and 2/10=0.2; budget = 2.0 * 68 = 136.
    # big: target 108.8 tokens -> 1.7 epochs (uncapped)
    # small: target 27.2 tokens -> 6.8 epochs -> capped at 4.0
    rows = [(1, "w " * 64, "en", "big"), (2, "w " * 4, "en", "small")]
    _write_documents(spark, tmp_path, rows)
    got = {r["source"]: r for r in
           q_token_budget_plan(spark, str(tmp_path)).collect()}
    assert _BUDGET_MULT == 2.0 and _MAX_EPOCHS == 4.0
    b = got["big"]
    assert b["n_tokens"] == 64 and b["target_share"] == 0.8
    assert b["epochs_needed"] == round(0.8 * 136 / 64, 4) == 1.7
    assert b["epochs_alloc"] == 1.7 and not b["capped"]
    assert b["achieved_tokens"] == round(1.7 * 64) == 109
    s = got["small"]
    assert s["target_share"] == 0.2
    assert s["epochs_needed"] == 6.8 and s["epochs_alloc"] == 4.0
    assert s["capped"] and s["achieved_tokens"] == 16
    tot = 1.7 * 64 + 4.0 * 4
    assert b["achieved_share"] == round(1.7 * 64 / tot, 4)
    assert s["achieved_share"] == round(16 / tot, 4)


def test_token_budget_plan_zero_token_source_dropped(spark, tmp_path):
    rows = [(1, "alpha beta gamma", "en", "s0"), (2, "!!! ...", "en", "empty")]
    _write_documents(spark, tmp_path, rows)
    got = {r["source"]: r for r in
           q_token_budget_plan(spark, str(tmp_path)).collect()}
    assert set(got) == {"s0"}
    # single surviving source takes the whole budget: 2.0 epochs, share 1
    assert got["s0"]["target_share"] == 1.0
    assert got["s0"]["epochs_alloc"] == 2.0
    assert got["s0"]["achieved_share"] == 1.0


# ------------------------------------------------------------ shard_balance


def test_shard_balance_hand_hash(spark, tmp_path):
    rows = [(i, "tok " * (i + 1), "en", "s0") for i in range(40)]
    _write_documents(spark, tmp_path, rows)
    exp = {}
    for i, text, _, _ in rows:
        sh = _md5int(f"{i}:shard") % _N_SHARDS
        n, t = exp.get(sh, (0, 0))
        exp[sh] = (n + 1, t + len(_toks(text)))
    out = q_shard_balance(spark, str(tmp_path)).collect()
    got = {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in out}
    assert got == exp
    mean_t = sum(t for _, t in exp.values()) / len(exp)
    max_t = max(t for _, t in exp.values())
    for r in out:
        assert r["rel_dev"] == round(exp[r["shard"]][1] / mean_t - 1, 4)
        assert r["straggler_ratio"] == round(max_t / mean_t, 4)


# -------------------------------------------------- embedding_norm_profile


def test_embedding_norm_profile_known_norms(spark, tmp_path):
    # label 0: norms 1..5 (axis-aligned vectors); label 1: all norm 2.
    rows = [(i, [float(i + 1)] + [0.0] * 7, 0) for i in range(5)]
    rows += [(10 + i, [0.0, 2.0] + [0.0] * 6, 1) for i in range(4)]
    _write_embeddings(spark, tmp_path, rows)
    got = {r["label"]: r for r in
           q_embedding_norm_profile(spark, str(tmp_path)).collect()}
    a = got[0]
    assert a["n_vecs"] == 5 and a["min_norm"] == 1.0 and a["max_norm"] == 5.0
    # percentile over [1,2,3,4,5]: pos = p*(n-1)
    assert a["p50"] == 3.0
    assert a["p10"] == 1.4  # pos 0.1*(5-1) = 0.4 -> 1 + 0.4
    assert a["p90"] == 4.6  # pos 3.6 -> 4 + 0.6
    assert a["mean_norm"] == 3.0
    b = got[1]
    assert b["n_vecs"] == 4
    assert (b["min_norm"], b["p50"], b["max_norm"]) == (2.0, 2.0, 2.0)
    assert b["mean_norm"] == 2.0


def test_embedding_norm_profile_interpolated(spark, tmp_path):
    # norms [3, 4] in one label: p10 = 3.1, p90 = 3.9 (linear interp)
    rows = [(1, [3.0, 0.0], 7), (2, [0.0, 4.0], 7)]
    _write_embeddings(spark, tmp_path, rows)
    r = q_embedding_norm_profile(spark, str(tmp_path)).collect()[0]
    assert (r["p10"], r["p50"], r["p90"]) == (3.1, 3.5, 3.9)
    assert math.isclose(r["mean_norm"], 3.5)


# ---------------------------------------------------- embedding_dim_stats


def test_embedding_dim_stats_known_moments_and_dead_dim(spark, tmp_path):
    from pdf_extractor_spark.queries import q_embedding_dim_stats

    # dim1: values [1,2,3,4]; dim2: all zero (dead); dim3: [0,0,1,1]
    vals = [[1.0, 0.0, 0.0], [2.0, 0.0, 0.0], [3.0, 0.0, 1.0], [4.0, 0.0, 1.0]]
    _write_embeddings(spark, tmp_path, [(i, v, 0) for i, v in enumerate(vals)])
    got = {r["dim"]: r for r in
           q_embedding_dim_stats(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}
    d1 = got[1]
    assert d1["mean_v"] == 2.5
    assert d1["var_v"] == round((1 + 4 + 9 + 16) / 4 - 2.5**2, 4) == 1.25
    assert d1["zero_frac"] == 0.0 and not d1["dead"]
    d2 = got[2]
    assert (d2["mean_v"], d2["var_v"], d2["zero_frac"]) == (0.0, 0.0, 1.0)
    assert d2["dead"]
    d3 = got[3]
    assert d3["mean_v"] == 0.5 and d3["var_v"] == 0.25
    assert d3["zero_frac"] == 0.5 and not d3["dead"]


# ----------------------------------------------------- centroid_confusion


def test_centroid_confusion_separated_clusters_with_mislabel(spark, tmp_path):
    from pdf_extractor_spark.queries import q_centroid_confusion

    # label 0 lives on axis x, label 1 on axis y; vec 99 is labeled 0
    # but sits on axis y -> assigned 1.  vec 50 is all-zero: excluded.
    rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(4)]
    rows += [(10 + i, [0.0, 2.0 + 0.01 * i], 1) for i in range(4)]
    rows += [(99, [0.0, 5.0], 0), (50, [0.0, 0.0], 1)]
    _write_embeddings(spark, tmp_path, rows)
    got = {(r["label"], r["assigned"]): (r["n_vecs"], r["label_share"])
           for r in q_centroid_confusion(spark, str(tmp_path)).collect()}
    # label 0: 4 on-axis correct, 1 mislabel assigned to centroid 1
    assert got[(0, 0)] == (4, 0.8)
    assert got[(0, 1)] == (1, 0.2)
    # label 1: the zero vector is dropped -> 4 of 4 correct
    assert got[(1, 1)] == (4, 1.0)
    assert (1, 0) not in got


def test_centroid_confusion_tie_breaks_to_lowest_label(spark, tmp_path):
    from pdf_extractor_spark.queries import q_centroid_confusion

    # two labels with IDENTICAL centroids -> every cosine ties at 1.0
    # after round(6); the winner must be the lowest label for all rows.
    rows = [(1, [1.0, 1.0], 3), (2, [2.0, 2.0], 3),
            (3, [1.0, 1.0], 5), (4, [2.0, 2.0], 5)]
    _write_embeddings(spark, tmp_path, rows)
    got = {(r["label"], r["assigned"]): r["n_vecs"]
           for r in q_centroid_confusion(spark, str(tmp_path)).collect()}
    assert got == {(3, 3): 2, (5, 3): 2}


# ------------------------------------------------- perplexity_prune_sweep


def test_perplexity_prune_sweep_hand_unigram_lm(spark, tmp_path):
    from pdf_extractor_spark.queries import q_perplexity_prune_sweep

    # tiny corpus, vocab << 1000 so every token is in-model
    docs = [(1, "aa aa aa aa", "en", "s"),      # common token -> low xent
            (2, "aa aa bb cc", "en", "s"),
            (3, "dd ee ff gg", "en", "s")]      # all-rare -> high xent
    _write_documents(spark, tmp_path, docs)
    counts = {}
    for _, text, _, _ in docs:
        for t in _toks(text):
            counts[t] = counts.get(t, 0) + 1
    nn = sum(counts.values())
    xent = {}
    for did, text, _, _ in docs:
        toks = _toks(text)
        xent[did] = round(
            sum(-math.log(counts[t] / nn) for t in toks) / len(toks), 4)
    out = q_perplexity_prune_sweep(spark, str(tmp_path)).collect()
    assert {r["max_xent"] for r in out} == {3.0, 4.0, 5.0, 6.0, 7.0, 8.0}
    tok_n = {1: 4, 2: 4, 3: 4}
    for r in out:
        kept = [d for d in xent if xent[d] <= r["max_xent"]]
        assert r["docs_kept"] == len(kept)
        assert r["docs_total"] == 3
        assert r["tokens_kept"] == sum(tok_n[d] for d in kept)
        assert r["doc_retention"] == round(len(kept) / 3, 4)
        assert r["token_retention"] == round(
            sum(tok_n[d] for d in kept) / 12, 4)
    # sanity: the sweep is not degenerate — some threshold separates docs
    assert min(xent.values()) < 2.0 < max(xent.values())


# ---------------------------------------------------- embedding_dup_stats


def test_embedding_dup_stats_counts_and_label_split(spark, tmp_path):
    from pdf_extractor_spark.queries import q_embedding_dup_stats

    # 3 copies of v1 (labels 0,0,1 -> label-inconsistency), 2 of v2, 1 of v3
    rows = [(1, [1.0, 2.0], 0), (2, [1.0, 2.0], 0), (3, [1.0, 2.0], 1),
            (4, [3.0, 0.0], 2), (5, [3.0, 0.0], 2), (6, [9.0, 9.0], 3)]
    _write_embeddings(spark, tmp_path, rows)
    r = q_embedding_dup_stats(spark, str(tmp_path)).collect()[0]
    assert r["n_vecs"] == 6 and r["n_distinct"] == 3
    assert r["n_dup_groups"] == 2 and r["n_extra_copies"] == 3
    assert r["max_group"] == 3 and r["max_labels_in_group"] == 2


def test_embedding_dup_stats_clean_corpus_all_zero_row(spark, tmp_path):
    from pdf_extractor_spark.queries import q_embedding_dup_stats

    rows = [(i, [float(i), 1.0], 0) for i in range(5)]
    _write_embeddings(spark, tmp_path, rows)
    r = q_embedding_dup_stats(spark, str(tmp_path)).collect()[0]
    assert (r["n_vecs"], r["n_distinct"]) == (5, 5)
    assert r["n_dup_groups"] == 0 and r["n_extra_copies"] == 0
    assert r["max_group"] == 1 and r["max_labels_in_group"] == 1


# --------------------------------------------------------- canary_phrases


def test_canary_phrases_counts_and_share(spark, tmp_path):
    from pdf_extractor_spark.queries import _CANARY_PHRASES, q_canary_phrases

    docs = [
        (1, "Lorem ipsum dolor. lorem ipsum again", "en", "s"),
        (2, "As an AI language model I cannot", "en", "s"),
        (3, "plain text with nothing suspicious", "en", "s"),
        (4, "Click here! click here. CLICK HERE", "en", "s"),
    ]
    _write_documents(spark, tmp_path, docs)
    got = {r["phrase"]: r for r in
           q_canary_phrases(spark, str(tmp_path)).collect()}
    assert set(got) == set(_CANARY_PHRASES)
    assert got["lorem ipsum"]["n_docs"] == 1
    assert got["lorem ipsum"]["n_occurrences"] == 2
    assert got["lorem ipsum"]["doc_share"] == 0.25
    assert got["as an ai language model"]["n_docs"] == 1
    assert got["click here"]["n_occurrences"] == 3
    assert got["terms of service"]["n_docs"] == 0
    assert got["terms of service"]["n_occurrences"] == 0
    assert got["terms of service"]["doc_share"] == 0.0


# ------------------------------------------------- inter_event_gap_profile


def test_inter_event_gap_profile_hand_gaps(spark, tmp_path):
    import datetime as dt

    from pdf_extractor_spark.queries import q_inter_event_gap_profile

    t0 = dt.datetime(2024, 1, 1)
    # user 1: view @0s, click @10s, click @40s -> gaps: click 10, click 30
    # user 2: view @0s, error @100s -> gap: error 100
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=10), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=40), 1, "click", 0.0, "{}"),
        (4, t0, 2, "view", 0.0, "{}"),
        (5, t0 + dt.timedelta(seconds=100), 2, "error", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r["event_type"]: r for r in
           q_inter_event_gap_profile(spark, str(tmp_path)).collect()}
    # first event per user has no gap -> 'view' never appears
    assert set(got) == {"click", "error"}
    c = got["click"]
    assert c["n_gaps"] == 2 and c["max_sec"] == 30
    assert c["p50_sec"] == 20.0  # interpolated between 10 and 30
    assert c["mean_sec"] == 20.0
    assert c["p90_sec"] == 28.0  # pos 0.9 -> 10 + 0.9*20
    e = got["error"]
    assert e["n_gaps"] == 1 and e["p50_sec"] == 100.0 and e["max_sec"] == 100


# ------------------------------------------------------ split_ngram_leakage


def _split_is_train(doc_id):
    return _md5int(f"{doc_id}:split") % 10 < 9


def _shingle8(text):
    t = _toks(text)
    if len(t) >= 8:
        return {_md5int(" ".join(t[i:i + 8])) for i in range(len(t) - 7)}
    return {_md5int(" ".join(t))}


def test_split_ngram_leakage_hand_split_and_overlap(spark, tmp_path):
    from pdf_extractor_spark.queries import q_split_ngram_leakage

    # find one val id and several train ids under the real split hash
    ids = list(range(200))
    val_ids = [i for i in ids if not _split_is_train(i)][:2]
    train_ids = [i for i in ids if _split_is_train(i)][:3]
    assert len(val_ids) == 2 and len(train_ids) == 3
    shared = "one two three four five six seven eight nine ten"
    unique = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = [(train_ids[0], shared, "en", "s"),
            (train_ids[1], "filler words only here", "en", "s"),
            (train_ids[2], "more filler text rows", "en", "s"),
            (val_ids[0], shared, "en", "s"),     # fully leaked from train
            (val_ids[1], unique, "en", "s")]     # no overlap
    _write_documents(spark, tmp_path, docs)
    r = q_split_ngram_leakage(spark, str(tmp_path)).collect()[0]
    text_by_id = {d[0]: d[1] for d in docs}
    tr_sh = set().union(*[_shingle8(text_by_id[i]) for i in train_ids])
    va_sh = {i: _shingle8(text_by_id[i]) for i in val_ids}
    all_val = set().union(*va_sh.values())
    leaked = all_val & tr_sh
    assert r["n_train_docs"] == 3 and r["n_val_docs"] == 2
    assert r["n_val_shingles"] == len(all_val)
    assert r["n_leaked_shingles"] == len(leaked)
    assert r["shingle_leak_rate"] == round(len(leaked) / len(all_val), 4)
    docs_leaked = sum(1 for i in val_ids if va_sh[i] & tr_sh)
    assert r["n_val_docs_leaked"] == docs_leaked == 1
    assert r["val_doc_leak_rate"] == 0.5


# --------------------------------------------------------- filter_lang_bias


def test_filter_lang_bias_relative_rates(spark, tmp_path):
    from pdf_extractor_spark.queries import q_filter_lang_bias

    passing = "the quick brown fox jumps over the lazy dog " * 4  # has 'the'
    failing = "wort satz zeile buch " * 10                        # no stopword
    rows = [(i, passing, "en", "s") for i in range(4)]
    rows += [(10 + i, failing, "de", "s") for i in range(3)]
    rows += [(20, passing, "de", "s")]   # one german doc passes
    _write_documents(spark, tmp_path, rows)
    got = {r["lang"]: r for r in
           q_filter_lang_bias(spark, str(tmp_path)).collect()}
    corpus = 5 / 8
    en = got["en"]
    assert en["n_docs"] == 4 and en["n_pass"] == 4
    assert en["pass_rate"] == 1.0 and en["corpus_rate"] == round(corpus, 4)
    assert en["relative_rate"] == round(1.0 / corpus, 4)
    de = got["de"]
    assert de["n_docs"] == 4 and de["n_pass"] == 1
    assert de["pass_rate"] == 0.25
    assert de["relative_rate"] == round(0.25 / corpus, 4)


# --------------------------------------------------------- lsh_band_balance


def test_lsh_band_balance_python_replication(spark, tmp_path):
    from pdf_extractor_spark.queries import (
        _BAND_DEFS,
        _LSH_BUCKET_CAP,
        _MH_COEFFS,
        _MH_PRIME,
        q_lsh_band_balance,
    )

    base = "zero one two three four five six seven eight nine"
    docs = [(i, base, "en", "s") for i in range(3)]          # 3 identical
    docs += [(10, base + " extra tail words", "en", "s")]    # near-dup
    docs += [(20, "totally different words entirely here now", "en", "s")]
    _write_documents(spark, tmp_path, docs)

    def shingles3(text):
        t = _toks(text)
        if len(t) >= 3:
            return [" ".join(t[i:i + 3]) for i in range(len(t) - 2)]
        return [" ".join(t)]

    buckets = {}
    for did, text, _, _ in docs:
        hs = [_md5int(s) for s in shingles3(text)]
        mh = [min((a * h + b) % _MH_PRIME for h in hs)
              for a, b in _MH_COEFFS]
        for band, (i, j) in enumerate(_BAND_DEFS):
            key = (band, f"{mh[i]}_{mh[j]}")
            buckets[key] = buckets.get(key, 0) + 1
    exp = {}
    for (band, _), n in buckets.items():
        exp.setdefault(band, []).append(n)
    got = {r["band"]: r for r in
           q_lsh_band_balance(spark, str(tmp_path)).collect()}
    assert set(got) == set(exp)
    for band, ns in exp.items():
        r = got[band]
        assert r["n_buckets"] == len(ns)
        assert r["n_docs"] == sum(ns) == 5
        assert r["max_bucket"] == max(ns)
        assert r["singleton_share"] == round(
            sum(1 for n in ns if n == 1) / len(ns), 4)
        assert r["est_pairs"] == sum(
            n * (n - 1) // 2 for n in ns if 2 <= n <= _LSH_BUCKET_CAP)
        assert r["over_cap_buckets"] == 0
    # the three identical docs share every band bucket
    assert all(got[b]["max_bucket"] >= 3 for b in got)


# ------------------------------------------------- turn_length_progression


def _ntile(n_rows, buckets=10):
    base, rem = divmod(n_rows, buckets)
    out = []
    for b in range(1, buckets + 1):
        out.extend([b] * (base + (1 if b <= rem else 0)))
    return out


def test_turn_length_progression_growth_curve(spark, tmp_path):
    from pdf_extractor_spark.queries import (
        _CONV_MOD,
        q_turn_length_progression,
    )

    # one conversation (all doc_ids ≡ 1 mod 53), 20 turns whose token
    # count equals the turn index -> clean monotone decile curve
    ids = [1 + _CONV_MOD * k for k in range(20)]
    rows = [(did, "w " * (k + 1), "en", "s") for k, did in enumerate(ids)]
    _write_documents(spark, tmp_path, rows)
    tiles = _ntile(20)
    exp = {}
    for k, t in enumerate(tiles):
        exp.setdefault(t, []).append(k + 1)
    got = {r["pos_decile"]: r for r in
           q_turn_length_progression(spark, str(tmp_path)).collect()}
    assert set(got) == set(exp)
    for d, toks in exp.items():
        r = got[d]
        assert r["n_turns"] == len(toks)
        assert r["mean_tok"] == round(sum(toks) / len(toks), 2)
        assert r["max_tok"] == max(toks)
        # each decile holds 2 consecutive ints -> p50 is their midpoint
        assert r["p50_tok"] == round(sum(toks) / 2, 2)
    assert got[1]["mean_tok"] < got[10]["mean_tok"]


# --------------------------------------------------- conv_repeated_openers


def test_conv_repeated_openers_detects_retry_loop(spark, tmp_path):
    from pdf_extractor_spark.queries import (
        _CONV_MOD,
        q_conv_repeated_openers,
    )

    # collect doc_ids in conv 0 whose md5-derived role is 'user'
    user_ids = [i for i in range(0, _CONV_MOD * 12, _CONV_MOD)
                if _md5int(str(i)) % 2 == 0][:4]
    assert len(user_ids) == 4
    texts = ["please fix the bug in my code",
             "please fix the bug again now",     # same opener
             "please fix the issue once more",   # same opener
             "how do i install this package"]
    rows = [(did, texts[k], "en", "s") for k, did in enumerate(user_ids)]
    # add assistant turns in the same conv — must be ignored
    asst_ids = [i for i in range(0, _CONV_MOD * 30, _CONV_MOD)
                if _md5int(str(i)) % 2 == 1][:2]
    rows += [(did, "please fix sure here is the answer", "en", "s")
             for did in asst_ids]
    _write_documents(spark, tmp_path, rows)
    out = q_conv_repeated_openers(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["conv"] == 0
    assert r["n_user_turns"] == 4 and r["n_openers"] == 2
    assert r["n_repeat_turns"] == 2 and r["max_opener_repeats"] == 3
    assert r["has_retry_loop"] and r["repeat_share"] == 0.5


# ----------------------------------------------------- turn_token_outliers


def test_turn_token_outliers_paste_bomb(spark, tmp_path):
    import statistics

    from pdf_extractor_spark.queries import _CONV_MOD, q_turn_token_outliers

    # conv 0: thirty 10-token turns + one 500-token paste bomb.  (A
    # single outlier among n turns can reach at most sqrt(n-1)·σ, so a
    # 3σ flag needs n > 10 — with n=31 the bomb sits at ~5.5σ.)
    ids = [_CONV_MOD * k for k in range(31)]
    toks = [10] * 30 + [500]
    rows = [(did, "w " * toks[k], "en", "s") for k, did in enumerate(ids)]
    # conv 1: uniform turns, no outliers
    ids1 = [1 + _CONV_MOD * k for k in range(5)]
    rows += [(did, "w " * 20, "en", "s") for did in ids1]
    _write_documents(spark, tmp_path, rows)
    got = {r["conv"]: r for r in
           q_turn_token_outliers(spark, str(tmp_path)).collect()}
    m = statistics.mean(toks)
    sd = statistics.pstdev(toks)
    r0 = got[0]
    assert r0["n_turns"] == 31 and r0["max_tok"] == 500
    assert r0["mean_tok"] == round(m, 2) and r0["sd_tok"] == round(sd, 2)
    exp_outliers = sum(1 for t in toks if t > round(m + 3 * sd, 6))
    assert r0["n_outliers"] == exp_outliers == 1
    assert r0["has_paste_bomb"]
    r1 = got[1]
    assert r1["n_outliers"] == 0 and not r1["has_paste_bomb"]
    assert r1["sd_tok"] == 0.0


# ---------------------------------------------------- centroid_separation


def test_centroid_separation_known_angles(spark, tmp_path):
    from pdf_extractor_spark.queries import q_centroid_separation

    # centroids: label 0 -> (1,0); label 1 -> (0,1); label 2 -> (1,1)/|.|
    rows = [(1, [2.0, 0.0], 0), (2, [4.0, 0.0], 0),
            (3, [0.0, 1.0], 1), (4, [0.0, 3.0], 1),
            (5, [1.0, 1.0], 2), (6, [3.0, 3.0], 2)]
    _write_embeddings(spark, tmp_path, rows)
    got = {(r["label_a"], r["label_b"]): r for r in
           q_centroid_separation(spark, str(tmp_path)).collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert got[(0, 1)]["centroid_cosine"] == 0.0
    assert got[(0, 2)]["centroid_cosine"] == round(1 / math.sqrt(2), 4)
    assert got[(1, 2)]["centroid_cosine"] == round(1 / math.sqrt(2), 4)
    assert not any(r["confusable"] for r in got.values())


def test_centroid_separation_flags_near_identical(spark, tmp_path):
    from pdf_extractor_spark.queries import q_centroid_separation

    rows = [(1, [1.0, 0.01], 0), (2, [1.0, 0.0], 1)]
    _write_embeddings(spark, tmp_path, rows)
    r = q_centroid_separation(spark, str(tmp_path)).collect()[0]
    assert r["confusable"] and r["centroid_cosine"] > 0.99


# ------------------------------------------------------ shuffle_run_audit


def test_shuffle_run_audit_python_islands(spark, tmp_path):
    from pdf_extractor_spark.queries import _N_SHARDS, q_shuffle_run_audit

    rows = [(i, "txt", "en", "a" if i % 3 else "b") for i in range(60)]
    _write_documents(spark, tmp_path, rows)
    shards = {}
    for i, _, _, src in rows:
        sh = _md5int(f"{i}:shard") % _N_SHARDS
        rk = hashlib.md5(f"{i}:rank".encode()).hexdigest()
        shards.setdefault(sh, []).append((rk, src))
    runs = {}
    for sh, items in shards.items():
        items.sort()
        prev = None
        for _, src in items:
            if src == prev:
                runs[src][-1] += 1
            else:
                runs.setdefault(src, []).append(1)
            prev = src
    got = {r["source"]: r for r in
           q_shuffle_run_audit(spark, str(tmp_path)).collect()}
    assert set(got) == set(runs)
    for src, lens in runs.items():
        r = got[src]
        assert r["n_docs"] == sum(lens)
        assert r["n_runs"] == len(lens)
        assert r["max_run"] == max(lens)
        assert r["mean_run"] == round(sum(lens) / len(lens), 2)


# ----------------------------------------------------- source_lang_matrix


def test_source_lang_matrix_shares(spark, tmp_path):
    from pdf_extractor_spark.queries import q_source_lang_matrix

    rows = [(1, "x", "en", "s0"), (2, "x", "en", "s0"), (3, "x", "de", "s0"),
            (4, "x", "zh", "s1")]
    _write_documents(spark, tmp_path, rows)
    got = {(r["source"], r["lang"]): r for r in
           q_source_lang_matrix(spark, str(tmp_path)).collect()}
    assert got[("s0", "en")]["n_docs"] == 2
    assert got[("s0", "en")]["lang_share_in_source"] == round(2 / 3, 4)
    assert got[("s0", "de")]["lang_share_in_source"] == round(1 / 3, 4)
    assert got[("s1", "zh")]["lang_share_in_source"] == 1.0
    assert got[("s1", "zh")]["corpus_share"] == 0.25
    assert got[("s0", "en")]["corpus_share"] == 0.5


# ------------------------------------------------ corpus_health_scorecard


def test_corpus_health_scorecard_hand_computed(spark, tmp_path):
    from pdf_extractor_spark.queries import q_corpus_health_scorecard

    passing = "the quick brown fox jumps over the lazy dog " * 4  # 180 chars
    rows = [(1, passing, "en", "s0"), (2, passing, "en", "s0"),  # exact dups
            (3, "short", "en", "s0"),                            # gate fail
            (4, passing + "x", "de", "s1")]
    _write_documents(spark, tmp_path, rows)
    r = q_corpus_health_scorecard(spark, str(tmp_path)).collect()[0]
    n_tok = sum(len(_toks(t)) for _, t, _, _ in rows)
    assert r["n_docs"] == 4 and r["n_tokens"] == n_tok
    assert r["n_distinct_texts"] == 3
    assert r["exact_dup_share"] == 0.25
    assert r["gate_pass_share"] == 0.75   # doc 3 fails the length band
    # langs: en 3/4, de 1/4
    ent = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert r["lang_entropy_bits"] == round(ent, 4)
    assert r["top_source_share"] == 0.75  # s0 has 3 of 4
    assert r["mean_doc_tokens"] == round(n_tok / 4, 2)


def test_corpus_health_scorecard_single_lang_zero_entropy(spark, tmp_path):
    from pdf_extractor_spark.queries import q_corpus_health_scorecard

    rows = [(i, f"unique text number {i} with words", "en", f"s{i}")
            for i in range(4)]
    _write_documents(spark, tmp_path, rows)
    r = q_corpus_health_scorecard(spark, str(tmp_path)).collect()[0]
    assert r["exact_dup_share"] == 0.0
    assert r["lang_entropy_bits"] == 0.0   # -1*log2(1) = 0
    assert r["top_source_share"] == 0.25


# ------------------------------------------------------------ lsh_precision


def test_lsh_precision_all_candidates_verified(spark, tmp_path):
    from pdf_extractor_spark.queries import (
        _VERIFY_JACCARD_MIN,
        q_lsh_precision,
    )

    base = "zero one two three four five six seven eight nine ten eleven"
    # 3 identical docs -> every candidate pair is an exact dup (J=1.0)
    rows = [(i, base, "en", "s") for i in range(3)]
    rows += [(20, "entirely different words here now today", "en", "s")]
    _write_documents(spark, tmp_path, rows)
    r = q_lsh_precision(spark, str(tmp_path)).collect()[0]
    assert r["n_candidates"] == 3  # C(3,2)
    assert r["n_verified"] == 3 and r["precision"] == 1.0
    assert r["mean_jaccard_verified"] == 1.0
    assert r["mean_jaccard_rejected"] == -1.0  # empty class sentinel
    assert 0 < _VERIFY_JACCARD_MIN <= 1


# --------------------------------------------------------- dup_arrival_span


def test_dup_arrival_span_hand_spans(spark, tmp_path):
    from pdf_extractor_spark.queries import q_dup_arrival_span

    rows = [(1, "copy a", "en", "s"), (5, "copy a", "en", "s"),      # span 4
            (10, "copy b", "en", "s"), (100, "copy b", "en", "s"),
            (400, "copy b", "en", "s"),                              # span 390
            (7, "unique text", "en", "s")]
    _write_documents(spark, tmp_path, rows)
    r = q_dup_arrival_span(spark, str(tmp_path)).collect()[0]
    assert r["n_dup_groups"] == 2 and r["n_dup_docs"] == 5
    assert r["mean_span"] == round((4 + 390) / 2, 2)
    assert r["max_span"] == 390 and r["min_span"] == 4


def test_dup_arrival_span_clean_corpus_sentinels(spark, tmp_path):
    from pdf_extractor_spark.queries import q_dup_arrival_span

    rows = [(i, f"unique {i}", "en", "s") for i in range(5)]
    _write_documents(spark, tmp_path, rows)
    r = q_dup_arrival_span(spark, str(tmp_path)).collect()[0]
    assert r["n_dup_groups"] == 0 and r["n_dup_docs"] == 0
    assert r["mean_span"] == -1.0
    assert r["max_span"] == -1 and r["min_span"] == -1


# --------------------------------------------------------- vocab_prune_plan


def test_vocab_prune_plan_hand_df(spark, tmp_path):
    from pdf_extractor_spark.queries import q_vocab_prune_plan

    # df: 'aa' in 3 docs (5 tokens), 'bb' in 2 (2), 'cc' in 1 (3)
    rows = [(1, "aa aa bb cc cc cc", "en", "s"),
            (2, "aa bb", "en", "s"),
            (3, "aa aa", "en", "s")]
    _write_documents(spark, tmp_path, rows)
    got = {r["min_df"]: r for r in
           q_vocab_prune_plan(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 5, 10}
    assert got[1]["vocab_kept"] == 3 and got[1]["token_share"] == 1.0
    assert got[2]["vocab_kept"] == 2        # aa, bb
    assert got[2]["tokens_kept"] == 7       # 5 + 2
    assert got[2]["token_share"] == 0.7
    assert got[3]["vocab_kept"] == 1        # aa only
    assert got[3]["tokens_kept"] == 5 and got[3]["token_share"] == 0.5
    assert got[5]["vocab_kept"] == 0 and got[5]["tokens_kept"] == 0
    assert got[10]["vocab_share"] == 0.0
    assert all(r["vocab_total"] == 3 for r in got.values())


def test_centroid_confusion_zero_norm_centroid_dropped(spark, tmp_path):
    from pdf_extractor_spark.queries import q_centroid_confusion

    # label 9's vectors are ALL zero -> its centroid is untargetable and
    # its rows are excluded as queries; label 0 must still self-assign.
    rows = [(1, [1.0, 0.0], 0), (2, [2.0, 0.0], 0),
            (3, [0.0, 0.0], 9), (4, [0.0, 0.0], 9)]
    _write_embeddings(spark, tmp_path, rows)
    got = {(r["label"], r["assigned"]): r["n_vecs"]
           for r in q_centroid_confusion(spark, str(tmp_path)).collect()}
    assert got == {(0, 0): 2}


def test_filter_lang_bias_nothing_passes_sentinel(spark, tmp_path):
    from pdf_extractor_spark.queries import q_filter_lang_bias

    # every doc fails the length band -> corpus rate 0 -> sentinel -1.0
    rows = [(1, "kurz", "de", "s"), (2, "tiny", "en", "s")]
    _write_documents(spark, tmp_path, rows)
    out = q_filter_lang_bias(spark, str(tmp_path)).collect()
    assert {r["lang"] for r in out} == {"de", "en"}
    for r in out:
        assert r["pass_rate"] == 0.0 and r["corpus_rate"] == 0.0
        assert r["relative_rate"] == -1.0


# ------------------------------------------------------ asof_join_tolerance


def test_asof_join_tolerance_drops_stale_matches(spark, tmp_path):
    import datetime as dt

    from pdf_extractor_spark.queries import _ASOF_TOL_US, q_asof_join_tolerance

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, sec, uid, etype, val):
        return (eid, t0 + dt.timedelta(seconds=sec), uid, etype, val, "{}")

    rows = [
        ev(1, 0, 1, "purchase", 10.0),
        ev(2, 60, 1, "click", 0.0),          # 60 s after -> matched
        ev(3, 7200 + 61, 1, "click", 0.0),   # 7261 s after -> stale, dropped
        ev(4, 0, 2, "purchase", 5.0),
        ev(5, 7200, 2, "click", 0.0),        # exactly at tolerance -> kept
        ev(6, 100, 3, "click", 0.0),         # no purchase ever -> dropped
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r["click_id"]: r for r in
           q_asof_join_tolerance(spark, str(tmp_path)).collect()}
    assert set(got) == {2, 5}
    assert got[2]["purchase_id"] == 1 and got[2]["gap_us"] == 60_000_000
    assert got[5]["purchase_id"] == 4 and got[5]["gap_us"] == _ASOF_TOL_US


# --------------------------------------------------- canonical_policy_delta


def test_canonical_policy_delta_longest_vs_first(spark, tmp_path):
    from pdf_extractor_spark.queries import q_canonical_policy_delta

    base = "zero one two three four five six seven eight nine ten"
    # cluster: docs 1-3 near-identical; doc 3 is the LONGEST but has the
    # highest doc_id, so keep-first picks doc 1 (shorter)
    rows = [(1, base, "en", "s"),
            (2, base + " tail", "en", "s"),
            (3, base + " tail words appended here", "en", "s"),
            (9, "completely unrelated text body now", "en", "s")]
    _write_documents(spark, tmp_path, rows)
    r = q_canonical_policy_delta(spark, str(tmp_path)).collect()[0]
    lens = {d[0]: len(d[1]) for d in rows}
    assert r["n_multi_clusters"] == 1 and r["docs_in_clusters"] == 3
    assert r["chars_keep_longest"] == lens[3]
    assert r["chars_keep_first"] == lens[1]
    assert r["chars_delta"] == lens[3] - lens[1]
    assert r["delta_share"] == round((lens[3] - lens[1]) / lens[1], 4)


def test_canonical_policy_delta_clean_corpus_zero_row(spark, tmp_path):
    from pdf_extractor_spark.queries import q_canonical_policy_delta

    rows = [(i, f"totally unique body number {i} distinct words {i}",
             "en", "s") for i in range(4)]
    _write_documents(spark, tmp_path, rows)
    r = q_canonical_policy_delta(spark, str(tmp_path)).collect()[0]
    assert r["n_multi_clusters"] == 0 and r["docs_in_clusters"] == 0
    assert r["chars_delta"] == 0 and r["delta_share"] == 0.0


# ------------------------------------------------- window_load_percentiles


def test_window_load_percentiles_hand_windows(spark, tmp_path):
    import datetime as dt

    from pdf_extractor_spark.queries import q_window_load_percentiles

    t0 = dt.datetime(2024, 1, 1)
    # window loads: [1, 2, 4] events in three distinct 5-min windows
    secs = [10] + [300 + 10, 300 + 20] + [900 + i for i in range(4)]
    rows = [(i, t0 + dt.timedelta(seconds=s), 1, "view", 0.0, "{}")
            for i, s in enumerate(secs)]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = q_window_load_percentiles(spark, str(tmp_path)).collect()[0]
    assert r["n_windows"] == 3 and r["n_events"] == 7
    assert r["p50_load"] == 2.0 and r["max_load"] == 4
    assert r["p90_load"] == round(2 + 0.8 * 2, 2)  # pos 1.8 between 2 and 4
    assert r["peak_to_median"] == 2.0
