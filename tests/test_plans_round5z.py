"""Physical-plan pins for the round-5 batch-28+ operators — the
100-TB properties, asserted: corpus scans bounded (or zero when the
lineage rides an eagerly checkpointed fold), no cartesian products, no
Python row paths, column pruning on id-only joins."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _final(df) -> str:
    df.collect()
    return _plan(df).split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def registry():
    from pdf_extractor_spark.queries import QUERY_REGISTRY
    return QUERY_REGISTRY


def test_hll_cumulative_two_folding_scans(spark, registry):
    """Register deltas + first-day histogram: two scans, both folding
    immediately; the day x day theta-join was designed out."""
    final = _final(registry["hll_cumulative_users"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 2
    assert "CartesianProduct" not in final
    assert "Window" in final


def test_lsh_band_planner_bounded_scans_no_cartesian(spark, registry):
    final = _final(registry["lsh_band_planner"][0](spark, SF_DIR))
    assert final.count("Scan parquet") <= 2   # adjacent-pair self-join
    assert "CartesianProduct" not in final


def test_cdc_chunk_single_scan(spark, registry):
    """Token Generate -> per-doc window -> chunk group -> digest group:
    the corpus is read once."""
    final = _final(registry["cdc_chunk_dedup"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Generate" in final
    assert "CartesianProduct" not in final


def test_isotonic_minimax_rides_checkpoint(spark, registry):
    """The triple self-join runs over the checkpointed 10-row decile
    table — zero parquet scans in the returned plan."""
    final = _final(registry["isotonic_calibration"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_huber_and_polish_iterate_over_checkpoints(spark, registry):
    for name in ("huber_location", "median_polish_grid"):
        final = _final(registry[name][0](spark, SF_DIR))
        assert final.count("Scan parquet") == 0, name


def test_daily_table_ops_ride_checkpointed_idx(spark, registry):
    """Bootstrap/HAC/robust-scale/quantile-regression/Siegel/dCor all
    run over the eagerly materialized |days| table."""
    for name in ("block_bootstrap_daily_ci", "newey_west_trend_se",
                 "sn_robust_scale", "quantile_regression_daily",
                 "siegel_repeated_median", "distance_correlation_daily"):
        final = _final(registry[name][0](spark, SF_DIR))
        assert final.count("Scan parquet") == 0, name
        assert "CartesianProduct" not in final, name


def test_secret_scan_prefilter_before_shuffle(spark, registry):
    """Candidate filter sits under the Generate chain; shuffles are
    candidate-sized.  Two scans: the token pass plus the per-source doc
    counts.  (This plan is long enough that toString() truncates, so
    the pin reads the complete formatted explain.)"""
    import re

    df = registry["secret_token_scan"][0](spark, SF_DIR)
    df.collect()
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    # AQE splits the tree into query stages; the numbered operator
    # details list each physical operator exactly once
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", fmt))
    assert 1 <= len(scan_ids) <= 2
    assert re.search(r"\(\d+\) Generate", fmt)
    assert "CartesianProduct" not in fmt


def test_pr_curve_single_scan_window_pass(spark, registry):
    final = _final(registry["pr_curve_ap"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Window" in final
    assert "SortMergeJoin" not in final


def test_split_auc_single_scan_no_join(spark, registry):
    final = _final(
        registry["split_distinguishability_auc"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Join" not in final


def test_poisson_gap_partitioned_windows(spark, registry):
    final = _final(registry["poisson_gap_check"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Window" in final
    assert "Join" not in final


def test_bbit_shares_one_shingle_materialization(spark, registry):
    """Signature and exact-set lineages both ride the checkpointed
    (doc_id, shingles) table; the corpus is shingled once, outside the
    returned plan."""
    final = _final(registry["bbit_minhash_error"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_prefix_filter_no_quadratic_blowup(spark, registry):
    final = _final(registry["prefix_filter_pairs"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 0   # rides checkpointed dt
    assert "CartesianProduct" not in final


def test_delta_agg_exactly_two_scans(spark, registry):
    """Merged spelling (one grouped scan) + the independent full
    recompute witness (second scan) — and nothing more."""
    final = _final(registry["delta_agg_maintenance"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 2


def test_deletion_audit_prunes_to_id_columns(spark, registry):
    """Anti-join shapes over id columns only: no text or vector payload
    in any ReadSchema."""
    df = registry["deletion_propagation_audit"][0](spark, SF_DIR)
    final = _final(df)
    assert "CartesianProduct" not in final
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    for line in fmt.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line and "embedding:" not in line, line


def test_encoding_win_single_scan_unpivot(spark, registry):
    """stack() unpivots map-side: one scan feeds all three columns'
    byte math — no per-column re-read."""
    final = _final(registry["encoding_win_estimate"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Generate" in final


def test_norm_ladder_single_scan(spark, registry):
    final = _final(
        registry["normalization_ladder_dedup"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_entropy_rate_two_grouping_scans(spark, registry):
    """Token marginal and within-doc bigrams are different groupings —
    two scans by necessity, then vocab-sized folds only."""
    final = _final(registry["ngram_entropy_rate"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 2
    assert "CartesianProduct" not in final


def test_ht_total_single_scan_pure_fold(spark, registry):
    final = _final(registry["ht_total_estimate"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    assert "Window" not in final


def test_sketch_family_rides_checkpoints(spark, registry):
    for name in ("kmv_distinct_error", "ams_f2_estimate",
                 "sampled_topk_fidelity", "hll_intersection_error",
                 "cum_sqrt_f_strata", "wasserstein_length_matrix",
                 "ess_weight_diagnostics", "packing_lower_bound",
                 "rmst_survival"):
        final = _final(registry[name][0](spark, SF_DIR))
        assert final.count("Scan parquet") == 0, name
        assert "CartesianProduct" not in final, name


def test_markov_order_single_scan_lag_windows(spark, registry):
    final = _final(registry["markov_order_test"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Window" in final
    assert "CartesianProduct" not in final


def test_binned_mi_single_scan(spark, registry):
    final = _final(
        registry["binned_mi_length_quality"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Window" in final


def test_km_greenwood_same_budget_as_km(spark, registry):
    final = _final(registry["km_greenwood_ci"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 2   # user fold + end-week max
    assert "Window" in final


def test_embedding_arrow_ops_no_generate(spark, registry):
    """lid/triplet/LW fold embeddings through mapInPandas GEMM/Gram
    partials — no per-dimension Generate (explode) of the vector table
    ever appears."""
    for name in ("lid_mle", "triplet_margin_mine", "lw_shrinkage_plan"):
        df = registry[name][0](spark, SF_DIR)
        final = _final(df)
        assert "Generate" not in final, name
        assert "CartesianProduct" not in final, name


def test_ksample_gates_single_fold_then_checkpoint(spark, registry):
    """mood/ansari-bradley ride the checkpointed (source, n_chars, c)
    fold (zero scans in the returned plan); bartlett is pure moment
    algebra over ONE corpus scan."""
    for name in ("mood_median_test", "ansari_bradley_scale"):
        final = _final(registry[name][0](spark, SF_DIR))
        assert final.count("Scan parquet") == 0, name
        assert "CartesianProduct" not in final, name
    final = _final(registry["bartlett_variance"][0](spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "Window" not in final  # moments only, no order statistics


def test_daily_monitor_ops_ride_checkpointed_daily(spark, registry):
    """cox-stuart / p-chart / lead-lag / xi all fold events to the
    |days| table eagerly; the returned plan never re-reads events."""
    for name in ("cox_stuart_trend", "p_chart_monitor", "lead_lag_ccf",
                 "chatterjee_xi_daily"):
        final = _final(registry[name][0](spark, SF_DIR))
        assert final.count("Scan parquet") == 0, name
        assert "CartesianProduct" not in final, name


def test_conv_protocol_ops_single_scan(spark, registry):
    """Retry bursts / dangling audit: one corpus scan, lag + running-sum
    windows over the conv-hash partitioning, no cartesian products.
    Vocab drift adds the token Generate but still reads parquet once."""
    for name, needs_generate in (("tool_retry_bursts", False),
                                 ("dangling_tool_audit", False),
                                 ("conv_vocab_drift", True)):
        final = _final(registry[name][0](spark, SF_DIR))
        assert final.count("Scan parquet") == 1, name
        assert "CartesianProduct" not in final, name
        assert "Window" in final, name
        if needs_generate:
            assert "Generate" in final, name


def test_clustering_agreement_rides_contingency_checkpoint(spark,
                                                           registry):
    """Every index is algebra over the checkpointed contingency — the
    embedding vectors never shuffle and never reappear."""
    final = _final(registry["clustering_external_agreement"][0](
        spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_mrr_single_matched_set_window(spark, registry):
    """The rank window runs over the query-matched tf set; the corpus
    is tokenized once (one scan feeding tl/dl/tf via reuse or a bounded
    re-read — never more than the bm25_topk lineage itself)."""
    final = _final(registry["mrr_eval"][0](spark, SF_DIR))
    assert final.count("CartesianProduct") == 0
    assert "Window" in final
