"""Physical-plan shape assertions — the ``.explain`` checks, as tests.

Correct values are not enough at 100 TB: these tests pin the plan
properties that decide whether the same query survives a 1000-executor
run — broadcast vs sort-merge, filter/projection pushdown into the scan,
no accidental cartesian products, whole-stage codegen on native paths.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def registry():
    from pdf_extractor_spark.queries import QUERY_REGISTRY
    return QUERY_REGISTRY


def test_dim_join_is_broadcast_not_sortmerge(spark, registry):
    df = registry["broadcast_dim_join"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_scan_pushes_filters_to_parquet(spark, registry):
    df = registry["range_scan"][0](spark, SF_DIR)
    fmt = _formatted(df)
    assert "PushedFilters: [IsNotNull(ts)" in fmt or "GreaterThanOrEqual(ts" in fmt


def test_projection_prunes_scan_columns(spark, registry):
    df = registry["projection_pushdown"][0](spark, SF_DIR)
    fmt = _formatted(df)
    # part has 6+ columns; the scan must read only the 4 the query needs
    read = fmt.split("ReadSchema:")[1].splitlines()[0]
    assert "p_partkey" in read and "p_brand" in read and "p_size" in read
    assert "p_retailprice" not in read and "p_comment" not in read


def test_extract_pipeline_prunes_unused_input_columns(spark):
    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.sources.transcripts import TRANSCRIPT_DDL

    df = spark.createDataFrame([], TRANSCRIPT_DDL)
    plan = _plan(extract_turns(df))
    # role/tool/ts never cross into the Python stage
    assert "ArrowEvalPython" in plan


def test_tables_udf_pruned_when_unselected(spark):
    """P1: selecting only extraction outputs must NOT evaluate the table
    UDF — include_tables=False is literally column pruning."""
    from pdf_extractor_spark.operators.extract import with_tables
    from pdf_extractor_spark.sources.transcripts import TRANSCRIPT_DDL

    df = spark.createDataFrame([("c", 0, "u", "a  b\nc  d", None, None)],
                               TRANSCRIPT_DDL)
    pruned = with_tables(df).select("conv_id", "turn_idx")
    assert "detect" not in _plan(pruned)
    n_python_nodes = _plan(pruned).count("ArrowEvalPython")
    assert n_python_nodes == 0


def test_lsh_pairs_has_no_cartesian(spark, registry):
    df = registry["minhash_lsh_pairs"][0](spark, SF_DIR)
    df.collect()
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the md5 signature subtree is evaluated exactly once: the bucket-size
    # guard is a window on the single bands pass, not a join-back
    assert plan.count("FileScan parquet") == 1
    assert "Window" in plan


def test_native_queries_stay_jvm_side(spark, registry):
    """The QA/native catalog queries must not silently fall back to Python
    UDFs — they exist to stay inside whole-stage codegen."""
    for name in ("pricing_summary", "normalize_native", "token_stats",
                 "fingerprint", "simhash", "token_run_islands"):
        df = registry[name][0](spark, SF_DIR)
        df.collect()  # materialize the AQE final plan before inspecting
        plan = _plan(df)
        assert "EvalPython" not in plan, f"{name} fell back to Python"
        # '*(n)' operator prefixes mark whole-stage-codegen regions in the
        # executed-plan string (WholeStageCodegen appears only in -formatted)
        assert "*(" in plan, f"{name} lost codegen"


def test_gemm_neardup_single_shuffle_arrow_arrays(spark, registry):
    """The GEMM near-dup scale path must shuffle each vector ONCE as an
    Arrow array (one groupBy(label) exchange into FlatMapGroupsInPandas) —
    no posexplode, no per-dimension rows, no join."""
    plan = _plan(registry["embedding_neardup_gemm"][0](spark, SF_DIR))
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1
    assert "Generate" not in plan  # posexplode would appear as Generate
    assert "Join" not in plan


def test_multiprobe_probes_are_limited_before_scan_join(spark, registry):
    """Multi-probe ANN must rank cells and LIMIT to P probes before the
    corpus join — the join input is P cells, not the corpus squared — and
    nothing may dim-explode the embeddings table (the centroid recompute is
    a single Arrow shuffle + per-cell numpy mean, not a posexplode)."""
    plan = _plan(registry["ivf_multiprobe"][0](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan  # posexplode of embeddings would be Generate
    assert "FlatMapGroupsInPandas" in plan  # the Arrow-shuffle centroid mean
    # the probes subtree carries a global limit of _IVF_PROBES
    from pdf_extractor_spark.queries import _IVF_PROBES
    assert f"limit={_IVF_PROBES}" in plan.lower() or "TakeOrderedAndProject" in plan


def test_multiprobe_side_table_path_skips_recompute(spark, registry):
    """With a caller-supplied centroids table (the k-means byproduct at
    corpus scale) the plan must not touch the embeddings table for
    centroids at all: no Arrow group shuffle, no explode — just the
    broadcast rank + probed-cell join."""
    from pdf_extractor_spark.queries import _t, compute_centroids, q_ivf_multiprobe

    emb = _t(spark, SF_DIR, "embeddings")
    side = spark.createDataFrame(
        compute_centroids(emb).toPandas(), "label int, centroid array<double>"
    )
    df = q_ivf_multiprobe(spark, SF_DIR, centroids=side)
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" not in plan  # no recompute on this path
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan
    # and it returns the same result as the self-contained path
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, registry["ivf_multiprobe"][0](spark, SF_DIR).collect()))
    assert a == b


def test_decontaminate_single_pass_no_join(spark, registry):
    """Decontamination is a single pass: the expensive tokenize→shingle→
    hash chain evaluates once (ONE scan of documents), bench presence is a
    window over hg, and there is no self-join that would recompute the
    subtree per side."""
    df = registry["decontaminate"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Join" not in final and "CartesianProduct" not in final
    assert final.count("FileScan parquet") == 1
    assert "Window" in final


def _streamed_side(final_plan: str) -> str:
    """Plan text of the broadcast join's STREAMED (corpus) subtree: between
    the BroadcastHashJoin node and its BroadcastQueryStage build side."""
    after_join = final_plan.split("BroadcastHashJoin", 1)[1]
    return after_join.split("BroadcastQueryStage", 1)[0]


def test_decontaminate_external_is_broadcast_semi_no_corpus_shuffle(
    spark, registry
):
    """The external-bench spelling must broadcast the (tiny) bench hash set
    and filter the corpus stream map-side: BroadcastHashJoin LeftSemi, no
    window over the corpus shingle set, no sort-merge fallback, and ZERO
    corpus-side exchange between the scan and the join — the only shuffles
    run on the (rare) matched rows in the final per-doc aggregate."""
    df = registry["decontaminate_external"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final and "LeftSemi" in final
    assert "SortMergeJoin" not in final
    assert "Window" not in final
    # corpus branch: scan → shingle/hash → join with no Exchange in between
    assert "Exchange" not in _streamed_side(final)
    # the corpus-side predicate reaches the parquet scan
    assert "GreaterThanOrEqual(doc_id,10)" in final
    # one corpus scan + one bench scan (the in-table stand-in for the
    # held-out eval table); a genuinely external bench would make this 1
    assert final.count("FileScan parquet") == 2


def test_decontaminate_bloom_prefilters_map_side_then_verifies(
    spark, registry
):
    """The Bloom spelling must probe the corpus stream map-side (Arrow-
    batched Python, BEFORE the join, zero shuffle) and verify survivors
    with the exact broadcast semi join."""
    df = registry["decontaminate_bloom"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final and "LeftSemi" in final
    assert "SortMergeJoin" not in final and "Window" not in final
    streamed = _streamed_side(final)
    assert "ArrowEvalPython" in streamed  # Bloom probe on the corpus branch
    assert "Exchange" not in streamed     # ... with no shuffle before the join


def test_cosine_topk_batch_single_shuffle_local_topk(spark, registry):
    """Batched ANN scoring must stay map-side until the tiny global merge:
    GEMM + local top-k inside MapInPandas (no Generate, no join), then
    exactly ONE exchange into the per-query window — shuffle volume is
    partitions x Q x k rows, never corpus x Q."""
    df = registry["cosine_topk_batch"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "MapInPandas" in plan
    assert "Window" in plan
    assert plan.count("Exchange") == 1
    assert "Generate" not in plan and "Join" not in plan


def test_corpus_curation_no_cartesian_contamination_is_semi(spark, registry):
    """The composed curation plan must keep each family's shape: the
    contamination check is a (broadcastable) semi join, nothing goes
    cartesian, and every doc-level join is an equi-join on doc_id."""
    df = registry["corpus_curation"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "LeftSemi" in final  # hg IN (bench subquery)
    assert "SortMergeJoin" not in final or "doc_id" in final  # no non-equi SMJ


def test_dup_spans_single_pass_no_self_join(spark, registry):
    """Span-dup counting must evaluate the shingle subtree ONCE: per-hash
    doc-counts via a window over hg on the single pairs pass — a
    dup↔pairs self-join re-scans and re-shingles the corpus (2 FileScans,
    no ReusedExchange; measured and rejected)."""
    df = registry["dup_spans"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert "Window" in final
    assert "Join" not in final


def test_simhash_pairs_single_pass_no_self_join(spark, registry):
    """SimHash pairing: signature subtree evaluated once (window bucket
    guard + collect_list pair expansion), no cartesian, no bands self-join
    re-scan."""
    df = registry["simhash_pairs"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert "CartesianProduct" not in final
    assert "Window" in final
    assert "Join" not in final  # pair expansion is bucket-local explode


def test_near_dup_verified_broadcasts_candidates(spark, registry):
    """Verification joins must broadcast the (bucket-capped, small)
    candidate side so the per-doc shingle-set relation never crosses an
    exchange: window+collect_list lineage gives cand poor size estimates,
    and an AQE sort-merge fallback would shuffle string arrays ~3x the
    corpus text.  Both joins pinned BroadcastHashJoin; the streamed
    (shingle-set) subtree of each has no Exchange above its scan."""
    df = registry["near_dup_verified"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in final and "CartesianProduct" not in final
    # every shingle-set (documents-scan) branch streams straight into its
    # broadcast join: no Exchange between the join and the streamed scan
    for chunk in final.split("BroadcastHashJoin")[1:]:
        streamed = chunk.split("BroadcastQueryStage", 1)[0]
        assert "Exchange" not in streamed


def test_repetition_signals_zero_shuffle(spark, registry):
    """Gopher repetition signals must be a pure map-side projection: the
    longest-run-in-sorted-array spelling needs no explode/groupBy, so the
    plan has NO exchange at all: Project straight over the scan.  (The
    higher-order lambdas are CodegenFallback expressions, so no
    WholeStageCodegen wrapper — still JVM-side and map-only; the
    assertion that matters is no Exchange, no Generate, no Python.)"""
    df = registry["repetition_signals"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode
    assert "EvalPython" not in plan  # all JVM-side


def test_embedding_int8_zero_shuffle(spark, registry):
    """int8 quantization is a per-row projection on the scan — no
    exchange, no generate, no Python eval."""
    df = registry["embedding_int8"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "EvalPython" not in plan


def test_cosine_topk_int8_broadcasts_query_and_takes_ordered(spark, registry):
    """Quantized retrieval: single-row query side broadcasts (nested-loop
    on a broadcast, never a shuffled cartesian), and the global top-k is a
    TakeOrdered merge of per-partition top-ks — only partitions x k rows
    move."""
    df = registry["cosine_topk_int8"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rp_lsh_pairs_no_bands_self_join_and_broadcast_verify(spark, registry):
    """RP-LSH banding must expand pairs bucket-locally (collect_list, no
    bands self-join) and broadcast the small candidate set onto the
    vector relation for the exact-cosine verify — the vectors never enter
    the band shuffle and never cross a sort-merge exchange."""
    df = registry["rp_lsh_pairs"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "SortMergeJoin" not in final
    assert final.count("BroadcastHashJoin") >= 2
    assert "Window" in final  # bucket-cap guard on the single bands pass


def test_semantic_dedup_single_arrow_shuffle_no_explode(spark, registry):
    """SemDeDup keep/prune must be the single-Arrow-shuffle grouped-GEMM
    shape: one exchange hash-partitioning the cells into
    FlatMapGroupsInPandas, no dimension explode, no self-join of the
    embeddings relation."""
    df = registry["semantic_dedup"][0](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan
    assert "Generate" not in plan  # no posexplode of embedding dims
    assert "Join" not in plan  # prior-max comes from the GEMM, not a join


def test_sequence_pack_single_window_shuffle_all_native(spark, registry):
    """Concat-and-chop packing is one hash partition by source feeding one
    Window — no join, no Python, no second exchange (the running sum and
    all offset math stay in native expressions)."""
    df = registry["sequence_pack"][0](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_sentence_dedup_two_text_shuffles_no_join(spark, registry):
    """C4-style sentence dedup: exactly the two hash shuffles the design
    claims (first-occurrence window by sentence key, regroup by doc_id) —
    no join-back, no Python, one Generate for the sentence explode."""
    df = registry["sentence_dedup"][0](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") == 2
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_mix_weights_window_only_over_tiny_aggregate(spark, registry):
    """Mixing weights: the corpus-sized relation crosses ONE hash exchange
    (the per-source aggregate); the OVER () window runs on the tiny
    aggregate via a single-partition exchange of a handful of rows."""
    df = registry["mix_weights"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert plan.count("Exchange") == 2 and "SinglePartition" in plan


def test_asof_join_is_union_window_no_join_one_shuffle(spark, registry):
    """As-of join: the union-tag-and-carry composition must plan as a
    single hash exchange on user_id + window — NO join operator at all.
    This is the property that makes it survive 10^12 events where an
    inequality join would go quadratic."""
    df = registry["asof_join"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_range_join_is_bucketed_hash_join_not_nested_loop(spark, registry):
    """Range join: the hour-bucket equi-join keeps Catalyst on a hash
    join; the naive inequality spelling would plan BroadcastNestedLoop/
    cartesian and melt at scale."""
    df = registry["range_join"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan
    assert "Join" in plan  # a real equi-join survives in the plan


def test_rollup_single_scan_expand_no_join(spark, registry):
    """Multi-resolution rollup: all grouping levels expand from ONE scan
    inside one aggregate — not one scan per resolution."""
    df = registry["rollup_multires"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Expand" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_hll_no_join_bounded_shuffle(spark, registry):
    """HLL: only the 256-register relation crosses the shuffle (map-side
    partial max bounds rows at m per partition); no join anywhere."""
    df = registry["hll_distinct"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_cms_probe_join_broadcasts_sketch(spark, registry):
    """Count-min: the d*w-cell sketch (provably <= 2048 rows) broadcasts
    for the candidate probe join — pinned with an explicit hint, not left
    to AQE size estimates."""
    df = registry["cms_heavy_hitters"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_dup_span_scrub_hash_only_shuffles_no_token_explode_past_scan(spark, registry):
    """Span scrub: the gram explode feeds hash-only aggregates; the token
    removal is a per-row higher-order filter — no corpus-wide token rows
    cross a shuffle, no nested-loop/cartesian anywhere."""
    df = registry["dup_span_scrub"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_hashed_classifier_is_map_only(spark, registry):
    """Classifier sweep: zero shuffles — the whole scoring pass is a
    per-row fold, the gopher_filters shape."""
    df = registry["hashed_classifier"][0](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") == 0
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_funnel_single_scan_shared_sort_three_windows(spark, registry):
    """Funnel: one events scan and one (user_id, ts, event_id) sort shared
    by all three running-min windows — the per-stage-join spelling would
    scan and shuffle three times."""
    import re

    df = registry["event_funnel"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert len(re.findall(r"\bSort\b", plan)) == 1
    assert plan.count("Window") == 3
    assert "Join" not in plan


def test_transitions_no_join_single_scan(spark, registry):
    """Transition matrix: lag window + hash agg over <= |types|^2 keys;
    the probability normalization windows over the tiny grouped table,
    never the event stream."""
    df = registry["event_transitions"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_json_props_parse_stays_jvm_side_single_shuffle(spark, registry):
    """JSON props: get_json_object evaluates inside the scan's project —
    no Python stage; the only exchange is the 5-key hash aggregate."""
    df = registry["json_props_stats"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_behavior_fingerprint_partial_agg_no_window(spark, registry):
    """Prefix fingerprint: sort_array(collect_list) builds the ordered
    opener inside a partial-aggregated groupBy — no Window operator, no
    join; only (hash, user) rows cross the second shuffle."""
    df = registry["behavior_fingerprint"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 2


def test_lsh_incremental_broadcasts_arrival_side_and_verdict_join(spark, registry):
    """Incremental LSH: the arrival band table and the candidate verdict
    table both BROADCAST (explicit hints) — the corpus band index never
    shuffles; the signature subtree is checkpoint-materialized once."""
    df = registry["lsh_incremental"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_ngram_contamination_bench_grams_broadcast(spark, registry):
    """Graded contamination: the benchmark gram set broadcasts
    (hint-pinned); the corpus side never sort-merges on gram hashes."""
    df = registry["ngram_contamination"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quantile_sketch_integer_bins_no_python_single_scan(spark, registry):
    """Quantile sketch: one scan folds into the additive bin table; the
    quantile probe is a broadcast join against 3 literal rows."""
    df = registry["quantile_sketch"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_skew_report_windows_run_over_grouped_table(spark, registry):
    """Skew report: the ranking windows see |keys| rows, not |events| —
    exactly one aggregate exchange plus the single-partition window."""
    df = registry["skew_report"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert plan.count("Exchange") == 2


def test_ann_recall_single_corpus_pass_no_rank_join(spark, registry):
    """ANN recall: ONE scored pass — both ranks come from windows over the
    same rows (exact by qid, in-cell by (qid, in_cell)); the two-CTE
    exact-vs-ivf join spelling re-scans the corpus per consumer."""
    df = registry["ann_recall"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 2  # corpus + query sample only
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # broadcast scoring join
    assert plan.count("Window") == 2


def test_ivf_build_stats_and_domain_caps_and_rate_anomaly_shapes(spark, registry):
    """Diagnostics family: one scan, no joins; windows only over grouped
    (or per-source ranked) tables."""
    for name in ("ivf_build_stats", "domain_caps", "rate_anomaly"):
        plan = _plan(registry[name][0](spark, SF_DIR)).split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1, name
        assert "Join" not in plan, name
        assert "EvalPython" not in plan and "InPandas" not in plan, name
    # domain_caps: both row_number expressions share ONE window operator
    dc = _plan(registry["domain_caps"][0](spark, SF_DIR)).split("== Initial Plan ==")[0]
    assert dc.count("Exchange") == 1


def test_char_entropy_zero_shuffle(spark, registry):
    """Entropy: sorted-run fold per row — no exchange anywhere (the
    repetition_signals shape applied to characters)."""
    df = registry["char_entropy"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 0
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_langid_confusion_window_over_cells(spark, registry):
    df = registry["langid_confusion"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_ks_drift_windows_over_value_table(spark, registry):
    """KS: ECDF windows run over the per-distinct-value grouped table;
    no sort-merge or python anywhere."""
    df = registry["ks_drift"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_minhash_est_error_all_joins_broadcast(spark, registry):
    """Estimation error: pair table broadcasts into signature and
    shingle-set lookups — never a shuffle of the set relation."""
    df = registry["minhash_est_error"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") == 4


def test_salted_join_salts_the_join_key(spark, registry):
    """Salted join: the dim side explodes to all salts (Generate) and the
    join keys include the salt column — the hot key spreads over _SALT_N
    reducers; no cartesian/nested-loop anywhere."""
    df = registry["salted_join"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "Generate explode" in plan
    assert "salt" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_zipf_fit_single_wordcount(spark, registry):
    df = registry["zipf_fit"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_unigram_drift_wordcount_materialized_once(spark, registry):
    """Unigram drift: the old-slice wordcount sits behind ONE eager
    checkpoint; only the cut aggregate and the arrival explode re-scan
    documents (the pure-CTE spelling re-ran the wordcount per consumer —
    6 scans, measured)."""
    df = registry["unigram_drift"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1  # model lookup


def test_graph_degree_stats_no_sortmerge(spark, registry):
    df = registry["graph_degree_stats"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cohort_retention_no_cartesian(spark, registry):
    df = registry["cohort_retention"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_token_gini_single_scan_no_join(spark, registry):
    df = registry["token_gini"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_containment_pairs_broadcasts_candidates(spark, registry):
    """Same pinned shape as near_dup_verified: candidate side broadcast in
    both verification joins; the shingle-set relation never sort-merges."""
    df = registry["containment_pairs"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in final and "CartesianProduct" not in final


def test_heuristic_kappa_single_scan_no_join(spark, registry):
    df = registry["heuristic_kappa"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "EvalPython" not in plan


def test_tokenizer_fertility_single_scan_no_join(spark, registry):
    df = registry["tokenizer_fertility"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "EvalPython" not in plan


def test_recency_weights_broadcasts_type_sums_no_window(spark, registry):
    """The per-type normalizers must come back as a broadcast join, not a
    window partitioned by the low-cardinality type column (which would
    funnel the fact table through |types| reducers)."""
    df = registry["recency_weights"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "Window" not in final


def test_boilerplate_prefix_single_scan_no_join(spark, registry):
    """LCP comes from the min/max aggregate, never a cross-doc compare:
    one scan, one aggregate, no join, no generator."""
    df = registry["boilerplate_prefix"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Generate" not in plan


def test_sliding_active_users_expand_not_join(spark, registry):
    """The 3x window fan-out must be an Expand over one scan — not a
    range join against a window dimension."""
    df = registry["sliding_active_users"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_embedding_drift_no_dim_explode(spark, registry):
    """The drift means must come from the two-level Arrow-partial tree —
    never a posexplode into per-dimension rows."""
    df = registry["embedding_drift"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Generate" not in plan        # no dim explode
    assert "MapInPandas" in plan         # partition partials
    assert "FlatMapGroupsInPandas" in plan  # per-parity reduce


def test_quality_calibration_single_scan_no_join(spark, registry):
    """Both signals are per-row expressions: the calibration table must
    be ONE scan + a 10-key aggregate, not a join of two scored passes."""
    df = registry["quality_calibration"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "EvalPython" not in plan


def test_robust_outliers_broadcast_medians(spark, registry):
    """The per-type median/MAD tables are |types| rows — both join-backs
    must broadcast; no sort-merge, no full-table window."""
    df = registry["robust_outliers"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in final
    assert "Window" not in final


def test_activity_profile_single_scan_window_on_grouped(spark, registry):
    df = registry["activity_profile"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_session_concurrency_cumsum_over_hour_keys_only(spark, registry):
    """The global cumulative sum must run AFTER the hour-key aggregate —
    a single-partition window is only safe because its input is bounded
    by the time range, not the event count."""
    df = registry["session_concurrency"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    # two windows total: the per-user sessionize pair + the global cumsum;
    # the cumsum window sits above the hour HashAggregate, never the raw scan
    assert "HashAggregate" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_level_shift_and_ewma_windows_over_grouped_table(spark, registry):
    for name in ("level_shift", "ewma_hourly"):
        df = registry[name][0](spark, SF_DIR)
        plan = _plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1, name
        assert "Join" not in plan, name
        # rolling frames run over the (type, hour) aggregate, so a Window
        # appears above a HashAggregate
        assert "Window" in plan and "HashAggregate" in plan, name


def test_vocab_coverage_vocab_join_is_broadcast(spark, registry):
    """The 1000-row vocabulary must broadcast back onto the (source,
    token) table — a sort-merge there would shuffle the whole wordcount."""
    df = registry["vocab_coverage"][0](spark, SF_DIR)
    df.collect()  # AQE final plan
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_readability_single_scan_no_join(spark, registry):
    df = registry["readability"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "EvalPython" not in plan


def test_edit_distance_pairs_bucket_local_no_cartesian(spark, registry):
    """Pair expansion must stay an equi-join on the bucket key (hash or
    broadcast), never a cartesian/nested-loop over members."""
    df = registry["edit_distance_pairs"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_k_anonymity_single_scan_no_join(spark, registry):
    df = registry["k_anonymity"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "EvalPython" not in plan


def test_pagerank_events_scans_once_no_cartesian(spark, registry):
    """Three unrolled iterations: every rank/edge join must be an
    equi-join (hash/broadcast), the events table is scanned exactly once
    for the transition aggregate."""
    df = registry["pagerank_events"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_ngram_novelty_window_not_selfjoin(spark, registry):
    """First-appearance must ride the gram-keyed window, never a
    gram-table self-join."""
    df = registry["ngram_novelty"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_source_vocab_overlap_size_joins_broadcast(spark, registry):
    df = registry["source_vocab_overlap"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in final


def test_topic_signature_totals_broadcast_no_selfjoin(spark, registry):
    """Rest-of-corpus counts must come from the token window over the
    grouped vocab table; source totals broadcast back."""
    df = registry["topic_signature"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_hapax_and_transition_entropy_single_scan_no_join(spark, registry):
    for name in ("hapax_rate", "transition_entropy"):
        df = registry[name][0](spark, SF_DIR)
        plan = _plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1, name
        assert "Join" not in plan, name


def test_winsorize_values_bounds_broadcast(spark, registry):
    df = registry["winsorize_values"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_decontaminate_semantic_bench_broadcast_no_sortmerge(spark, registry):
    """The bench embedding side must broadcast into the corpus scan; the
    cross join is a BroadcastNestedLoop over a tiny side BY DESIGN."""
    df = registry["decontaminate_semantic"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    assert "Broadcast" in final


def test_quality_percentile_norm_bucket_joins_broadcast_no_doc_window(
    spark, registry
):
    """percent_rank must come from bucket-table cumsums broadcast back —
    a Window directly over the document scan would be the single-task
    global-sort plan this op exists to avoid."""
    df = registry["quality_percentile_norm"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in final
    # exactly the four bucket-table windows (below/total × source/global);
    # none keyed per-document
    assert final.count("Window") == 4
    assert "windowspecdefinition(doc_id" not in final
    # the inferred isnotnull(score) must NOT collapse the classifier fold
    # into the scan as a DataFilter (round-3 pathology)
    scan = final.split("FileScan parquet")[1].splitlines()[0]
    assert "aggregate(" not in scan


def test_vocab_coverage_curve_single_corpus_shuffle(spark, registry):
    df = registry["vocab_coverage_curve"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_source_length_ttest_stats_selfjoin_broadcast(spark, registry):
    df = registry["source_length_ttest"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final or "BroadcastNestedLoopJoin" in final
    assert "SortMergeJoin" not in final


def test_weighted_sample_maponly_key_partial_topk(spark, registry):
    """The sampling key is map-only; the rank<=5 filter must push a
    PARTIAL WindowGroupLimit below the exchange, so each task forwards at
    most 5 rows per source — the per-shard top-k + merge shape, planned
    automatically."""
    df = registry["weighted_sample"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert plan.count("Window [") == 1
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_temperature_mix_windows_over_source_table(spark, registry):
    df = registry["temperature_mix"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_ann_recall_multiprobe_one_scored_pass(spark, registry):
    """Both probe depths and the exact rank must ride ONE broadcast-scored
    corpus pass — no exact-vs-probed join, no second embeddings scan."""
    df = registry["ann_recall_multiprobe"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 2  # corpus + broadcast queries
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_burstiness_single_scan_integer_folds(spark, registry):
    df = registry["burstiness"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_psi_drift_two_scan_ecdf(spark, registry):
    """Round-5 shape: the corpus is read exactly twice (doc_id-only cut
    scan + the grouped ECDF pass, both inside the eager localCheckpoint
    build), and the returned plan — deciles, binning, PSI fold — runs
    entirely over the checkpointed per-distinct-length table: zero
    parquet scans, no sort-merge join."""
    df = registry["psi_drift"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert final.count("Scan parquet") == 0
    assert "ExistingRDD" in final or "Scan rdd" in final.lower()


def test_jsd_sources_grid_is_broadcast_never_sortmerge(spark, registry):
    df = registry["jsd_sources"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_type_correlation_hour_keyed_selfjoin_tiny(spark, registry):
    """The series alignment join runs over the (type, hour) AGGREGATE,
    never raw events; folds are integer sums."""
    df = registry["type_correlation"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert final.count("FileScan parquet") <= 2


def test_autocorrelation_single_scan_window_on_grouped(spark, registry):
    df = registry["autocorrelation"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" in plan and "HashAggregate" in plan


def test_dup_group_report_single_scan_digest_windows(spark, registry):
    """Group spreads ride digest-keyed windows on ONE scan — the
    join-back spelling recomputed md5 per probe row (measured 2.8x)."""
    df = registry["dup_group_report"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_reservoir_sample_partial_window_group_limit(spark, registry):
    """md5 rank key is map-only; rank<=5 pushes a PARTIAL WindowGroupLimit
    below the exchange (each task forwards <=5 rows per source)."""
    df = registry["reservoir_sample"][0](spark, SF_DIR)
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_hamming_topk_broadcast_query_side_no_smj(spark, registry):
    """Sign-bit signatures fold map-side; the query side is a tiny
    broadcast; per-query top-k must rank through a window group limit —
    never a sort-merge join or corpus-sized sort."""
    df = registry["hamming_topk"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "BroadcastNestedLoopJoin" in final or "BroadcastHashJoin" in final
    assert "WindowGroupLimit" in final


def test_hamming_recall_no_corpus_cartesian(spark, registry):
    df = registry["hamming_recall"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_doc_perplexity_model_broadcast_scoring_zero_shuffle(spark, registry):
    """The wordcount is the only corpus shuffle; the 1000-entry model
    rides a 1-row broadcast and scoring is a per-row fold (no explode, no
    token join on the scoring side)."""
    df = registry["doc_perplexity"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert final.count("Scan parquet") == 2  # model pass + scoring pass


def test_length_filter_sweep_single_scan_tiny_grid(spark, registry):
    df = registry["length_filter_sweep"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final


def test_source_dedup_matrix_grouplocal_pairs_no_smj(spark, registry):
    """Duplicate work rides ONE digest shuffle; pair expansion is
    group-local (posexplode over each digest's source SET, never a
    corpus self-join); the zero-fill grid joins broadcast-small
    distinct-source sides."""
    df = registry["source_dedup_matrix"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    # digest pass + the two single-column DISTINCT-source passes, minus
    # whatever AQE deduplicates into ReusedExchange on this host
    assert 1 <= final.count("Scan parquet") <= 3


def test_lsh_recall_shared_shingle_checkpoint(spark, registry):
    """The tokenize->shingle subtree materializes once: signatures,
    banding, AND the exact-Jaccard truth all read the checkpointed
    table, so the returned plan touches no parquet at all."""
    df = registry["lsh_recall"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 0
    assert "SortMergeJoin" not in final
    assert "BroadcastHashJoin" in final  # candidate probe is broadcast


def test_semantic_threshold_sweep_checkpointed_pairs(spark, registry):
    """The expensive within-cell dot-product join computes once into the
    checkpoint; the grid fan-out and both aggregates read it — returned
    plan touches no parquet."""
    df = registry["semantic_threshold_sweep"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_pack_efficiency_single_scan_tiny_grid(spark, registry):
    df = registry["pack_efficiency"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final and "CartesianProduct" not in final


def test_mix_schedule_single_scan_config_grid(spark, registry):
    df = registry["mix_schedule"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final and "CartesianProduct" not in final


def test_source_ks_anomaly_single_scan_grid_windows(spark, registry):
    """One corpus scan folds to the (source, length) count table; both
    ECDFs are windows over the zero-filled grid (the DISTINCT side scans
    may be AQE-reused)."""
    df = registry["source_ks_anomaly"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    assert "Window" in final


def test_heaps_law_bounded_scans_no_smj(spark, registry):
    """Explode pass + per-doc size fold + doc_id-only max — nothing
    corpus-sized past the groupBys; the regression runs over 10 rows."""
    df = registry["heaps_law"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    assert 1 <= final.count("Scan parquet") <= 3


def test_token_budget_plan_single_scan_tiny_windows(spark, registry):
    """ONE corpus scan folds token counts to |sources| rows; the share /
    budget / cap math and both normalization windows run on that tiny
    aggregate — no join back, no second scan."""
    df = registry["token_budget_plan"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    assert "Generate" not in final  # token counting never explodes


def test_shard_balance_single_scan_64key_fold(spark, registry):
    """One scan, one 64-key grouped fold with map-side combine; the
    deviation/straggler windows run over the 64-row table."""
    df = registry["shard_balance"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Generate" not in final
    assert "SortMergeJoin" not in final


def test_embedding_norm_profile_no_dim_explode(spark, registry):
    """The L2 norm is a per-row array fold — the embedding array never
    unpacks into rows (no Generate) and the only exchange carries
    |labels| keys."""
    df = registry["embedding_norm_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Generate" not in final
    assert "SortMergeJoin" not in final


def test_embedding_dim_stats_no_corpus_explode(spark, registry):
    """Per-dim moments ride partition partials (one array row per
    partition); the only Generate is the posexplode of the single
    reduced row — the plan reads parquet once and never SMJs."""
    df = registry["embedding_dim_stats"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final


def test_centroid_confusion_broadcast_gemm_no_join(spark, registry):
    """Centroids collect driver-side (k rows) and broadcast into the
    scoring GEMM — the returned plan is scan → mapInPandas → one
    (label, assigned) groupBy: no join, no n×k fan-out."""
    df = registry["centroid_confusion"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Generate" not in final


def test_perplexity_prune_sweep_model_broadcast_tiny_grid(spark, registry):
    """doc_perplexity's two passes + the 6-row threshold grid: the
    model side joins back as a broadcast literal, scoring is a per-row
    fold, and the sweep aggregate reduces to 6 groups."""
    df = registry["perplexity_prune_sweep"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert 1 <= final.count("Scan parquet") <= 2
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_embedding_dup_stats_single_scan_group_fold(spark, registry):
    """One GROUP BY over the vector value, one-row fold on top — no
    join, no explode of the embedding array."""
    df = registry["embedding_dup_stats"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Generate" not in final
    assert "SortMergeJoin" not in final


def test_canary_phrases_mapside_grid_no_regex_udf(spark, registry):
    """The 5-row phrase grid expands map-side (broadcast nested loop
    against a tiny exploded literal); counting is native string math —
    no Python stage, no SMJ."""
    df = registry["canary_phrases"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final
    assert "Python" not in final  # native path only


def test_inter_event_gap_profile_one_window_one_agg(spark, registry):
    """One user-keyed window exchange feeds the |types|-key percentile
    aggregate — no join anywhere."""
    df = registry["inter_event_gap_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_split_ngram_leakage_hashed_before_shuffle_no_smj(spark, registry):
    """Shingles become bigints map-side and the distinct (doc, split, h)
    table materializes ONCE — train set, val set, and doc counts all
    read the checkpoint, so the returned plan touches NO parquet (the
    pure-CTE spelling re-tokenized the corpus 3x, measured)."""
    df = registry["split_ngram_leakage"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 0  # checkpointed subtree
    assert "Python" not in final


def test_filter_lang_bias_single_scan_tiny_window(spark, registry):
    df = registry["filter_lang_bias"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final
    assert "Generate" not in final


def test_lsh_band_balance_one_signature_pass(spark, registry):
    """One tokenize+hash scan feeds the (band, bucket) aggregate; the
    band report is a 4-group fold — no join, no pair expansion."""
    df = registry["lsh_band_balance"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_turn_length_progression_one_conv_window(spark, registry):
    df = registry["turn_length_progression"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_conv_repeated_openers_conv_keyed_folds_only(spark, registry):
    df = registry["conv_repeated_openers"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Generate" not in final


def test_turn_token_outliers_single_exchange(spark, registry):
    df = registry["turn_token_outliers"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_centroid_separation_broadcast_pair_grid(spark, registry):
    """One corpus scan builds centroids; the k² pair grid is a
    broadcast join of the k-row table — no SMJ, no second scan."""
    df = registry["centroid_separation"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "BroadcastNestedLoopJoin" in final or "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_shuffle_run_audit_no_global_sort(spark, registry):
    """Both row_number windows partition by shard — the plan contains
    no global (single-partition) sort and no join."""
    df = registry["shuffle_run_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    # a global sort would appear as Exchange SinglePartition
    assert "SinglePartition" not in final


def test_source_lang_matrix_metadata_fold(spark, registry):
    df = registry["source_lang_matrix"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_corpus_health_scorecard_single_scan_grouping_sets(spark, registry):
    """GROUPING SETS folds the lang table, the source table, and the
    global totals (incl. distinct digests) in ONE Expand+aggregate pass
    — the plan reads parquet exactly once and contains no join."""
    df = registry["corpus_health_scorecard"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Expand" in final


def test_lsh_precision_rides_verified_plan(spark, registry):
    """The fold adds no scan: the shingle subtree is the shared
    localCheckpoint, candidates stay broadcast — the returned plan
    reads no parquet and contains no SMJ."""
    df = registry["lsh_precision"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert final.count("Scan parquet") == 0  # checkpointed shingles


def test_dup_arrival_span_single_digest_fold(spark, registry):
    df = registry["dup_arrival_span"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Generate" not in final


def test_vocab_prune_plan_one_wordcount_tiny_grid(spark, registry):
    df = registry["vocab_prune_plan"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final


def test_asof_join_tolerance_single_window_no_range_join(spark, registry):
    """Union-tag-and-carry + post-filter: one user-keyed window, no
    nested-loop/cartesian range join."""
    df = registry["asof_join_tolerance"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Window" in final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "SortMergeJoin" not in final


def test_canonical_policy_delta_one_cluster_fold(spark, registry):
    """After the components job: one cluster_id-keyed fold, one-row
    summary — no extra corpus scan beyond labels+n_chars."""
    df = registry["canonical_policy_delta"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final


def test_window_load_percentiles_tumbling_fold(spark, registry):
    df = registry["window_load_percentiles"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_funnel_latency_single_scan_shared_sort(spark, registry):
    """event_funnel's contract extended: one events scan, three Window
    operators over one shared user-keyed sort, no joins."""
    df = registry["funnel_latency"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_lateness_profile_no_single_partition_window(spark, registry):
    """The high-watermark windows are per-shard: the plan must exchange
    on the shard key, never collapse to one partition for the sort."""
    df = registry["lateness_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    # the only SinglePartition exchange allowed is the final 1-row rollup,
    # which happens AFTER the window sort; the window itself must be
    # hash-partitioned on shard
    assert "hashpartitioning(shard" in final


def test_knn_hubness_no_corpus_cross_join(spark, registry):
    """The GEMM candidate stage is map-side: no cartesian/nested-loop
    join may appear; the only joins are the in-degree left join."""
    df = registry["knn_hubness"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "MapInPandas" in final


def test_join_fanout_probe_moves_counts_not_facts(spark, registry):
    """Both fact tables collapse to per-key counts (partial_count before
    the exchange) and only the count tables join."""
    df = registry["join_fanout_probe"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "partial_count" in final


def test_embedding_isotropy_single_scan_no_explode(spark, registry):
    """The Gram fold is map-side: one embeddings scan, no Generate
    (posexplode) of the d^2 pairs ever reaches the plan."""
    df = registry["embedding_isotropy"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Generate" not in final
    assert "Join" not in final


def test_mirror_direction_matrix_single_scan(spark, registry):
    """Digest windows replace the join-back: the full text column is
    read AT MOST once (on the dup-free sf0.001 fixture AQE's empty-
    relation propagation prunes the matrix branch entirely, leaving just
    the sentinel — 0 scans; the join-back spelling would show 2)."""
    df = registry["mirror_direction_matrix"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") <= 1
    assert "SortMergeJoin" not in final


def test_langid_cascade_routing_broadcast_margin_grid(spark, registry):
    """The 3-row margin grid joins as a broadcast against the one-scan
    ratio fold — never a shuffle join."""
    df = registry["langid_cascade_routing"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final


def test_big_spender_orders_takeordered_no_cartesian(spark, registry):
    df = registry["big_spender_orders"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final
    assert "CartesianProduct" not in final


def test_region_revenue_rollup_all_broadcast_chain(spark, registry):
    """Three successive broadcast joins; the fact table never shuffles
    before the final grouped aggregate."""
    df = registry["region_revenue_rollup"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in final


def test_retention_sweep_single_corpus_scan(spark, registry):
    """The (user, day) grid is built once; TTL sweep and per-user
    windows run over the grid, never a corpus rescan."""
    df = registry["retention_sweep"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_knn_label_agreement_gemm_not_interpreted_cosine(spark, registry):
    """The scoring stage must be the map-side GEMM (MapInPandas), never
    the interpreted higher-order-function cosine over all pairs (the
    first spelling: 25.4 s vs 2.7 s at sf0.1)."""
    df = registry["knn_label_agreement"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "MapInPandas" in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "CartesianProduct" not in final


def test_customer_order_distribution_outer_join_no_cartesian(spark, registry):
    """Q13 shape: the LEFT OUTER join survives to the physical plan (the
    zero-order bucket depends on it) and nothing degenerates to a
    cartesian product."""
    df = registry["customer_order_distribution"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "LeftOuter" in final
    assert "CartesianProduct" not in final
    assert final.count("Scan parquet") == 2


def test_small_qty_revenue_decorrelated_no_cartesian(spark, registry):
    """Q17 shape: the correlated avg-quantity subquery is decorrelated
    into joins — no nested-loop re-execution per outer row, and the
    brand-pruned part side broadcasts."""
    df = registry["small_qty_revenue"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_sole_late_supplier_grid_then_window(spark, registry):
    """Q21 shape: exists/not-exists collapses to window counts over the
    (order, supplier) grid — no correlated re-scans (3 scans total: fact,
    orders, supplier dim), top-20 is a TakeOrdered."""
    df = registry["sole_late_supplier"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 3
    assert "TakeOrderedAndProject" in final
    assert "CartesianProduct" not in final


def test_inactive_rich_customers_anti_join_scalar_broadcast(spark, registry):
    """Q22 shape: NOT EXISTS compiles to a broadcast anti-join (never a
    per-row subquery), and the two scalar thresholds ride 1-row
    broadcast nested loops, not shuffles."""
    df = registry["inactive_rich_customers"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "LeftAnti" in final
    assert "CartesianProduct" not in final


def test_promo_revenue_share_single_fact_scan_broadcast_dim(spark, registry):
    df = registry["promo_revenue_share"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_top_supplier_share_window_over_aggregate_only(spark, registry):
    """Q15 shape: one fact shuffle (the suppkey aggregate); the global
    max is a window over the |suppliers| frame, never a fact rescan."""
    df = registry["top_supplier_share"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_returned_item_report_filter_pushed_takeordered(spark, registry):
    """Q10 shape: the returnflag filter reaches the lineitem scan, all
    three dims broadcast, top-20 is a TakeOrdered."""
    df = registry["returned_item_report"][0](spark, SF_DIR)
    fmt = _formatted(df)
    assert "EqualTo(l_returnflag,R)" in fmt
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") == 3
    assert "TakeOrderedAndProject" in final


def test_tool_call_profile_single_scan(spark, registry):
    df = registry["tool_call_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "SortMergeJoin" not in final


def test_turn_latency_profile_single_scan_window(spark, registry):
    df = registry["turn_latency_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_seasonality_chi2_single_scan(spark, registry):
    """The full-grid chi-square comes from the SPARSE (type, hour) table
    — no calendar generator, no second pass."""
    df = registry["seasonality_chi2"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_supplier_concentration_hhi_broadcast_dim(spark, registry):
    df = registry["supplier_concentration_hhi"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_cross_split_semantic_leakage_gemm_not_lambda(spark, registry):
    """Scoring rides the broadcast-GEMM MapInPandas path (the
    knn_label_agreement lesson: interpreted lambda cosines are 10x
    slower); the only nested-loop join is the 3-row threshold grid over
    the |test|-row max table."""
    df = registry["cross_split_semantic_leakage"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "MapInPandas" in final
    assert "CartesianProduct" not in final


def test_revenue_pareto_curve_windows_over_aggregate(spark, registry):
    """One orders shuffle; the rank/cumsum windows and the 3-share grid
    run over the |customers|-row aggregate only."""
    df = registry["revenue_pareto_curve"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_session_opening_paths_no_collect_list(spark, registry):
    """First-3 pivot is conditional aggregation — no whole-session
    collect_list buffers; top-20 is a TakeOrdered."""
    df = registry["session_opening_paths"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "collect_list" not in final
    assert "TakeOrderedAndProject" in final


def test_split_label_balance_single_scan(spark, registry):
    df = registry["split_label_balance"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_order_backlog_no_orderlevel_join(spark, registry):
    """Each fact folds to monthly grain BEFORE the merge — the full
    outer join touches only two month-series, never order-level rows
    (no sort-merge join of the raw tables)."""
    df = registry["order_backlog_timeseries"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "CartesianProduct" not in final


def test_nation_trade_balance_dual_role_broadcast(spark, registry):
    """Q7 shape: nation joins twice under different roles — both as
    broadcasts; top-25 is a TakeOrdered; no cartesian between the two
    nation roles."""
    df = registry["nation_trade_balance"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 4
    assert "TakeOrderedAndProject" in final
    assert "CartesianProduct" not in final


def test_market_share_by_year_single_aggregate(spark, registry):
    """Q8 shape: focal share comes from conditional aggregation in the
    SAME buffer as the total — no self-join of the flow table."""
    df = registry["market_share_by_year"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 5
    assert "SortMergeJoin" not in final


def test_margin_proxy_codegen_margin_expression(spark, registry):
    """Q9 shape: the computed margin folds inside whole-stage codegen —
    dims all broadcast, single aggregate."""
    df = registry["margin_proxy_by_nation_year"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    # "*(N)" prefixes are the whole-stage-codegen span markers in the
    # executed-plan print; the margin sum must sit inside one
    assert "*(" in final and "HashAggregate" in final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_discount_band_revenue_pushdown_two_columns(spark, registry):
    """Q6 shape: the quantity filter reaches the parquet scan and the
    read schema stays at the three needed columns."""
    df = registry["discount_band_revenue"][0](spark, SF_DIR)
    fmt = _formatted(df)
    assert "LessThan(l_quantity,24.0)" in fmt
    read = fmt.split("ReadSchema:")[1].splitlines()[0]
    assert "l_discount" in read and "l_extendedprice" in read
    assert "l_partkey" not in read and "l_shipdate" not in read


def test_session_type_lift_checkpointed_counts(spark, registry):
    """The 4-way lift join must read the CHECKPOINTED token-count table
    (ExistingRDD scans), never re-run the sessionize window stack per
    reference — zero parquet scans in the final plan."""
    df = registry["session_type_lift"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 0
    assert "ExistingRDD" in final
    assert "SortMergeJoin" not in final


def test_embedding_outlier_mahalanobis_no_explode(spark, registry):
    """Scoring is the two-pass map-only numpy path: no per-dimension
    row explode (Generate) and no join — the corpus moves only through
    the 20-row TakeOrdered."""
    df = registry["embedding_outlier_mahalanobis"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "MapInPandas" in final
    assert "Generate" not in final
    assert "Join" not in final
    assert "TakeOrderedAndProject" in final


def test_ttr_length_regression_single_scan_closed_form(spark, registry):
    """OLS from the five classic sums in one map-side combine — one
    scan, no window, no join."""
    df = registry["ttr_length_regression"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final and "Window" not in final


def test_new_user_share_trend_grid_window(spark, registry):
    """First-day tagging is a min-window over the (user, day) grid —
    one scan, never a self-join of events."""
    df = registry["new_user_share_trend"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_tokenizer_compression_sweep_no_token_explode(spark, registry):
    """The only Generate is the 3-struct config fan-out of per-doc
    COUNTS — token lists never explode into rows."""
    df = registry["tokenizer_compression_sweep"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert final.count("Generate") == 1


def test_dedup_threshold_sensitivity_broadcast_grid(spark, registry):
    """The 4-row threshold grid broadcasts against the bucket-capped
    pair table; no sort-merge joins anywhere in the sweep."""
    df = registry["dedup_threshold_sensitivity"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_tool_latency_effect_single_scan(spark, registry):
    df = registry["tool_latency_effect"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_sort_locality_audit_bucketed_windows(spark, registry):
    """Run counting partitions by (key, bucket) — parallel windows, one
    scan, one Generate for the 2-key fan-out, no global single-partition
    sort."""
    df = registry["sort_locality_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert final.count("Generate") == 1
    assert "Exchange SinglePartition" not in final.split("HashAggregate")[0]


def test_range_partition_plan_two_pass_broadcast_bounds(spark, registry):
    """The honest two-pass range planner: boundary array broadcasts as
    a 1-row nested loop; bucketing is map-side (no per-boundary join);
    exactly 2 corpus scans."""
    df = registry["range_partition_plan"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "SortMergeJoin" not in final


def test_conv_tool_correlation_single_scan(spark, registry):
    df = registry["conv_tool_correlation"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_moments_merge_audit_single_scan(spark, registry):
    """Both spellings reduce the SAME per-source partial table — the
    corpus is scanned once."""
    df = registry["moments_merge_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_doc_embedding_coverage_norms_fold_before_join(spark, registry):
    """Vectors collapse to (vec_id, norm) BEFORE the join — the
    embedding array never crosses the join; no sort-merge at sf."""
    df = registry["doc_embedding_coverage"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "LeftOuter" in final
    assert "CartesianProduct" not in final


def test_first_tool_depth_single_scan(spark, registry):
    df = registry["first_tool_depth"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_contrastive_pair_budget_single_scan(spark, registry):
    df = registry["contrastive_pair_budget"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_role_vocab_echo_single_token_shuffle(spark, registry):
    df = registry["role_vocab_echo"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "CollectSet" not in final and "collect_set" not in final


def test_audience_overlap_matrix_keyed_no_cartesian(spark, registry):
    """The pair expansion is a keyed (user, day) self-join, never a
    cartesian; the per-type sizes come back as broadcasts."""
    df = registry["audience_overlap_matrix"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastHashJoin" in final


def test_weekday_weekend_contrast_single_scan(spark, registry):
    df = registry["weekday_weekend_contrast"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_min_cost_supplier_part_filter_before_window(spark, registry):
    """Q2 shape: the size/type part filter pushes to the part scan (the
    window then ranks ~3% of parts) and every dim resolves broadcast."""
    df = registry["min_cost_supplier"][0](spark, SF_DIR)
    df.collect()
    fmt = _formatted(df)
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final
    assert "LessThanOrEqual(p_size,10)" in fmt
    assert "EqualTo(p_type,SMALL)" in fmt


def test_order_priority_check_exists_is_semi_join(spark, registry):
    """Q4 shape: the correlated EXISTS plans as LEFT SEMI on the order
    key with the quarter filter pushed to the orders scan."""
    df = registry["order_priority_check"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert "LeftSemi" in final
    assert "IsNotNull(o_orderdate)" in fmt
    assert final.count("Scan parquet") == 2


def test_important_part_value_no_second_fact_scan(spark, registry):
    """Q11 shape: the global total is a window over the |parts|
    aggregate — lineitem is scanned exactly once.  Pinned on the
    pre-adaptive plan: at tiny SF the NATION_0 slice is empty and AQE
    legitimately collapses the whole query to an EmptyRelation."""
    df = registry["important_part_value"][0](spark, SF_DIR)
    static = df._jdf.queryExecution().sparkPlan().toString()
    assert static.count("Scan parquet") == 3  # lineitem + supplier + nation
    assert "Window" in static


def test_late_shipment_priority_year_filter_pushed(spark, registry):
    df = registry["late_shipment_priority"][0](spark, SF_DIR)
    df.collect()
    fmt = _formatted(df)
    assert "GreaterThanOrEqual(l_shipdate" in fmt
    assert "LessThan(l_shipdate" in fmt


def test_supplier_part_breadth_blocklist_is_anti_join(spark, registry):
    """Q16 shape: NOT IN over the never-null supplier key plans as a
    broadcast anti join, and the size/brand filters push to part."""
    df = registry["supplier_part_breadth"][0](spark, SF_DIR)
    static = df._jdf.queryExecution().sparkPlan().toString()
    fmt = _formatted(df)
    # pre-adaptive pin: at tiny SF no supplier has a negative balance,
    # so AQE's empty-build rewrite (correctly) erases the anti join
    assert "LeftAnti" in static
    assert "CartesianProduct" not in static
    assert "In(p_size" in fmt


def test_disjunctive_band_revenue_brand_pushed(spark, registry):
    """Q19 shape: the per-table halves of the OR-of-ANDs reach the
    scans — the brand union on part, the quantity envelope inferred on
    lineitem stays inside the joined filter."""
    df = registry["disjunctive_band_revenue"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert "BroadcastHashJoin" in final
    assert "Or(And(EqualTo(p_brand" in fmt or "In(p_brand" in fmt


def test_dominant_part_suppliers_single_fact_scan(spark, registry):
    """Q20 shape: the per-part total is a window over the (supplier,
    part) grid — lineitem scanned once, the LIKE prefix pushed to part."""
    df = registry["dominant_part_suppliers"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert final.count("Scan parquet") == 4
    assert "Window" in final
    assert "StringStartsWith(p_name,red" in fmt


def test_engagement_state_transitions_one_corpus_shuffle(spark, registry):
    """The (user, day) fold is the only corpus-sized exchange; the lag
    window rides the user-hash partitioning the fold produced, so the
    plan shows exactly one scan and no join."""
    df = registry["engagement_state_transitions"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_value_decile_migration_single_body_scan(spark, registry):
    """The event_id cut is a scalar broadcast; both halves fold from ONE
    body scan via conditional sums (2 scans total: mx + body), and the
    ntile ranking operates on the user grid, never re-reading events."""
    df = registry["value_decile_migration"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" in final  # 1-row scalar cross join


def test_template_skeleton_clusters_digest_window_no_selfjoin(spark, registry):
    """dup_group_report shape: regexp collapse + md5 evaluate once per
    row, cluster size is a window over the digest key — one scan, one
    keyed shuffle, never a self-join re-hashing a probe side."""
    df = registry["template_skeleton_clusters"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_rp_distortion_sweep_keyed_pairs_no_cartesian(spark, registry):
    """Pairs come from the keyed vec_id+1 self-join and the 3-k grid
    fans out AFTER projection — no cartesian anywhere."""
    df = registry["rp_distortion_sweep"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "SortMergeJoin" in final or "ShuffledHashJoin" in final \
        or "BroadcastHashJoin" in final


def test_intra_doc_lang_switch_no_explode(spark, registry):
    """Sentence classification runs as in-row array HOFs: one scan, no
    corpus-sized Generate, no join — the only exchange is the source
    fold."""
    df = registry["intra_doc_lang_switch"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Generate" not in final
    assert "Join" not in final


def test_l_diversity_audit_single_scan_expand_agg(spark, registry):
    """k_anonymity shape: one scan, no joins; the single exact
    count-distinct plans as the partial/merge re-aggregation over
    (QI-cell, event_type) — all map-side combinable."""
    df = registry["l_diversity_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "partial_count(distinct event_type" in final


def test_customer_reorder_gap_broadcast_dim(spark, registry):
    """The lag window rides the custkey exchange; customer resolves as a
    broadcast dim — no sort-merge on the fact side."""
    df = registry["customer_reorder_gap"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "Window" in final
    assert "CartesianProduct" not in final


def test_type_hourweek_similarity_single_wordcount_shuffle(spark, registry):
    """The (type, hour-of-week) fold's exchange is REUSED for both sides
    of the pair join — the corpus is scanned once, not twice."""
    df = registry["type_hourweek_similarity"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1 or "ReusedExchange" in final
    assert "CartesianProduct" not in final


def test_digit_density_filter_single_scan(spark, registry):
    """Both regexp folds evaluate inside the scan; the band fold is the
    only exchange."""
    df = registry["digit_density_filter"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_tenure_activity_curve_one_corpus_shuffle(spark, registry):
    """The min() window and (user, week) fold share the user-hash
    exchange; the eligibility theta-join is broadcast nested-loop over
    week-cardinality aggregates, never the corpus."""
    df = registry["tenure_activity_curve"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") <= 2  # exchange reuse may dedupe
    assert "BroadcastNestedLoopJoin" in final
    assert "CartesianProduct" not in final


def test_part_price_dispersion_partkey_fold_then_broadcast(spark, registry):
    """The fact table collapses to the per-part moment grid before part
    joins broadcast — no sort-merge on the fact side."""
    df = registry["part_price_dispersion"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_label_centroid_drift_no_generate(spark, registry):
    """Partial-sum tree keyed by (label, parity): no Generate, nothing
    corpus-sized past the scan; the even/odd join is label-cardinality."""
    df = registry["label_centroid_drift"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Generate" not in final
    assert final.count("Scan parquet") == 1


def test_wau_growth_accounting_windows_share_user_hash(spark, registry):
    """One corpus fold to the (user, week) grid; min/lag/lead all ride
    the user-hash partitioning — no joins at all."""
    df = registry["wau_growth_accounting"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_order_line_status_consistency_fold_before_join(spark, registry):
    """Lineitem collapses to per-orderkey status booleans BEFORE the
    orderkey join, so the join carries |orders| rows on both sides."""
    df = registry["order_line_status_consistency"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert "CartesianProduct" not in final
    # the aggregate must sit below the join in the plan text
    assert fmt.index("HashAggregate") < fmt.index("Join") or \
        "BroadcastHashJoin" in final


def test_register_profile_no_generate_single_scan(spark, registry):
    """Pronoun counts are in-row HOFs over the token array: one scan,
    no Generate, no wordcount shuffle."""
    df = registry["register_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Generate" not in final
    assert "Join" not in final


def test_power_user_curve_single_scan_no_join(spark, registry):
    """One scan folds to the distinct (user, week, day) grid; the
    histogram and both share windows are re-aggregations of it."""
    df = registry["power_user_curve"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_order_total_reconciliation_fold_before_join(spark, registry):
    """Lineitem collapses to one recomputed total per orderkey BEFORE
    the LEFT join; no cartesian anywhere."""
    df = registry["order_total_reconciliation"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert "CartesianProduct" not in final
    assert fmt.index("HashAggregate") < fmt.index("Join") or \
        "BroadcastHashJoin" in final


def test_segment_priority_affinity_fold_before_join(spark, registry):
    """Orders folds to (custkey, priority) grain before meeting
    customer; expected/chi2 windows run over the ~25-cell table."""
    df = registry["segment_priority_affinity"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert "CartesianProduct" not in final
    assert final.count("Scan parquet") == 2
    assert fmt.index("HashAggregate") < fmt.index("Join") or \
        "BroadcastHashJoin" in final
    assert "Window" in final


def test_benford_value_audit_one_scan_grid_broadcast(spark, registry):
    """One events scan folds to the digit histogram; the 9-row VALUES
    grid joins without a cartesian; chi2 windows over 9 rows."""
    df = registry["benford_value_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final
    assert "Window" in final


def test_price_qty_elasticity_zero_join_single_scan(spark, registry):
    """Five regression moments in one grouped aggregate: one scan, no
    join, no window."""
    df = registry["price_qty_elasticity"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" not in final


def test_fd_violation_audit_five_scans_no_join(spark, registry):
    """Each FD is an independent distinct-count aggregate; the five
    tables are unioned, never joined."""
    df = registry["fd_violation_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 5
    assert "Join" not in final
    assert "Union" in final


def test_bracket_balance_audit_codegen_single_scan(spark, registry):
    """Delimiter counts are length/replace expressions — one scan, no
    regex Generate, no join, no window."""
    df = registry["bracket_balance_audit"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Generate" not in final
    assert "Window" not in final


def test_cohort_ltv_curve_single_scan_windows(spark, registry):
    """One fold to the (user, week) grid; cohort stamp and cumulative
    windows ride grouped tables — no joins."""
    df = registry["cohort_ltv_curve"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_retail_price_realization_fold_before_join(spark, registry):
    """Lineitem folds to one (ext, qty) pair per partkey BEFORE the
    partkey join with part."""
    df = registry["retail_price_realization"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    fmt = _formatted(df)
    assert "CartesianProduct" not in final
    assert final.count("Scan parquet") == 2
    assert fmt.index("HashAggregate") < fmt.index("Join") or \
        "BroadcastHashJoin" in final


def test_column_profile_one_pruned_scan_per_leg(spark, registry):
    """Ten union legs, each a scalar aggregate over a single-column
    pruned scan; no joins."""
    df = registry["column_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 10
    assert "Join" not in final
    assert "Union" in final


def test_last_touch_attribution_single_exchange(spark, registry):
    """Both ignore-nulls windows ride one (user, time) sort; one scan,
    no self-join."""
    df = registry["last_touch_attribution"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    # the two last_value functions share ONE Window operator; the only
    # other Window is the share sum over the grouped |channels| table
    assert final.count("Window") == 2
    lv_lines = [ln for ln in final.splitlines() if "last_value" in ln]
    assert len(lv_lines) == 1 and lv_lines[0].count("last_value") == 2


def test_brand_cross_sell_checkpoint_and_broadcast_marginals(spark, registry):
    """The (customer, brand) cell table is checkpointed (plan shows the
    ExistingRDD scan, not three copies of the 3-table join) and the
    brand marginals broadcast into the pair table."""
    df = registry["brand_cross_sell_lift"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    # base parquet scans must NOT appear: the checkpoint cut them off
    assert "Scan parquet" not in final
    assert final.count("BroadcastHashJoin") >= 2


def test_srm_check_single_scan_no_join(spark, registry):
    """Arm assignment is an in-row hash; one fold to the (week, user,
    arm) grid then a |weeks|-row aggregate."""
    df = registry["srm_check"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_mean_shift_decomposition_windows_over_groups(spark, registry):
    """One scan to (group, period) sums; pivot + identity windows run
    over |groups| rows, no join."""
    df = registry["mean_shift_decomposition"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_anova_decomposition_pure_fold(spark, registry):
    """Grouped moments then one scalar fold: no join, no window."""
    df = registry["anova_variance_decomposition"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" not in final


def test_customer_active_streaks_single_scan(spark, registry):
    """Distinct (customer, month) grid, dense_rank island stamp riding
    the customer hash, grid re-aggregations — one scan, no join."""
    df = registry["customer_active_streaks"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_naive_forecast_backtest_one_sort(spark, registry):
    """All four lag columns (two values, two contiguity stamps) share
    ONE Window operator over the (type, hour) sort.  Pinned on the
    pre-adaptive plan: at tiny SF no hour has a contiguous lag-24
    predecessor, the result is empty, and AQE legitimately collapses
    the whole query to an EmptyRelation."""
    df = registry["naive_forecast_backtest"][0](spark, SF_DIR)
    static = df._jdf.queryExecution().sparkPlan().toString()
    assert static.count("Scan parquet") == 1
    assert "Join" not in static
    lag_lines = [ln for ln in static.splitlines()
                 if "lag(" in ln and "Window" in ln]
    assert len(lag_lines) == 1 and lag_lines[0].count("lag(") == 4


def test_order_bundle_profile_no_join(spark, registry):
    """Lineitem folds to per-order (n_lines, net) map-side; histogram
    and share window over <= |max bundle| rows."""
    df = registry["order_bundle_profile"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_cuped_scalar_broadcast_not_global_window(spark, registry):
    """The cut week is a 1-row broadcast cross join, never a global
    window over the user grid; the user fold is the only exchange."""
    df = registry["cuped_variance_reduction"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Window" not in final
    assert "BroadcastNestedLoopJoin" in final or "BroadcastHashJoin" in final
    assert final.count("Scan parquet") == 2  # metric scan + 1-col min scan


def test_ratio_metric_delta_ci_pure_folds(spark, registry):
    """Arm is an in-row hash; (user, arm) fold then per-arm moments —
    no join, no window."""
    df = registry["ratio_metric_delta_ci"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" not in final


def test_event_trigram_motifs_one_sort(spark, registry):
    """Both lead columns share ONE Window over the (user, time) sort;
    the motif fold + rounded-rank limit follow."""
    df = registry["event_trigram_motifs"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    lead_lines = [ln for ln in final.splitlines()
                  if "lead(" in ln and "Window" in ln]
    assert len(lead_lines) == 1 and lead_lines[0].count("lead(") == 2


def test_hill_tail_index_take_ordered_not_global_sort(spark, registry):
    """The top-k tail plans as TakeOrderedAndProject (per-partition
    heaps), never a full global Sort of the corpus."""
    df = registry["hill_tail_index"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final
    assert "Join" not in final
    assert final.count("Scan parquet") == 1


def test_eb_shrinkage_windows_over_brand_table(spark, registry):
    """One grouped-moment fold; all EB components are windows over the
    |brands| table — one scan, no join."""
    df = registry["eb_shrunken_brand_means"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_slo_burn_rate_range_windows_over_hours(spark, registry):
    """Corpus collapses to |hours| rows before the RANGE burn windows;
    one scan, no join."""
    df = registry["slo_burn_rate"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "specifiedwindowframe(RangeFrame" in final


def test_did_aa_validation_no_corpus_window(spark, registry):
    """Broadcast cut + user fold + 2-row pivot: no Window operator at
    all, two scans (metric + 1-column min)."""
    df = registry["did_aa_validation"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Window" not in final
    assert final.count("Scan parquet") == 2


def test_bh_discovery_windows_over_sources(spark, registry):
    """Grand mean, p ranks, and the step-up cutoff are all windows over
    the |sources| table — one scan, no join."""
    df = registry["bh_discovery_scan"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_mann_whitney_histogram_not_rank(spark, registry):
    """U comes from the value histogram: one scan, the cumulative rides
    the |distinct lengths| table, no corpus-row rank anywhere."""
    df = registry["mann_whitney_lengths"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    # the only window is the below-cumulative over the histogram
    assert final.count("Window") == 1


def test_periodogram_trig_over_hour_table(spark, registry):
    """Corpus folds to |hours| first; the 4-period grid cross-joins the
    tiny hour table broadcast — no corpus-sized cartesian."""
    df = registry["periodogram_probe"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Window" in final  # centering over the hour table
    assert "BroadcastNestedLoopJoin" in final or "CartesianProduct" not in final


def test_overdispersion_pure_folds(spark, registry):
    """(type, user) fold then per-type moments — no join, no window."""
    df = registry["overdispersion_check"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" not in final


def test_capture_recapture_single_user_fold(spark, registry):
    """Week flags and existence come from ONE user-keyed fold; the week
    base is a 1-row broadcast — no corpus window."""
    df = registry["capture_recapture_users"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Window" not in final
    assert final.count("Scan parquet") == 2  # user fold + 1-col min scan


def test_km_survival_windows_over_age_table(spark, registry):
    """User fold -> per-age counts; risk set and log-sum survival ride
    the <=|max age| table; end week is a 1-row broadcast."""
    df = registry["km_survival_weekly"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2  # user fold + 1-col max scan
    assert "Window" in final


def test_kendall_tau_pairs_on_tiny_table(spark, registry):
    """The self-join runs on the |sources| aggregate (two column-pruned
    scans), never a corpus-row pair table."""
    df = registry["kendall_tau_sources"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    # Spark reuses the grouped-aggregate exchange for the second join
    # side when it can (1 scan); 2 column-pruned scans is the ceiling
    assert final.count("Scan parquet") in (1, 2)


def test_jackknife_single_scan_windows(spark, registry):
    """Delete-one means come from windows over the |sources| moments —
    one scan, no join, no scalar-subquery re-execution."""
    df = registry["jackknife_source_ci"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_mde_planning_scalar_cross_join(spark, registry):
    """One (user, week) fold + one moment fold; the horizon grid is a
    broadcast VALUES cross join — no window anywhere."""
    df = registry["mde_planning_curve"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Window" not in final


def test_median_ci_histogram_cumulative(spark, registry):
    """Order statistics come off the length-histogram cumulative — one
    scan, one window, no join, no corpus-row rank."""
    df = registry["median_ci_binomial"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" in final


def test_extreme_value_shrinking_folds(spark, registry):
    """Corpus -> hours -> days -> one row: pure keyed aggregates."""
    df = registry["extreme_value_load"][0](spark, SF_DIR)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" not in final
