"""The driver's correctness gate as a parametrized test: every registry
query runs on Spark and its DuckDB oracle twin at sf0.001, compared on
schema + rowcount + order-insensitive values."""

from __future__ import annotations

import pytest

from smartpool_bigdata_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF_DIR)
    if q.oracle is None:
        assert sdf.count() >= 0  # rows-only check, mirroring the driver
        return
    assert_matches_oracle(sdf, duck, q.oracle)


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)


# The 50 queries that held the driver window in round 3 (all green in
# CORRECTNESS_r03.json).
R3_WINDOW = frozenset({
    "pricing_summary", "daily_event_stats", "order_priority_pivot",
    "ingest_watermark", "latest_order_per_customer", "top_orders_per_priority",
    "peak_event_hours", "customer_order_summary", "segment_fee_model",
    "event_orphan_users", "events_from_customers", "hourly_value_deviation",
    "event_cost_model", "event_range_flags", "active_ids_union",
    "order_dup_check", "event_null_profile", "urgent_open_orders",
    "allowed_event_types", "top_value_orders", "event_hourly_window",
    "event_projection_normalize", "stream_event_hourly_window",
    "stream_dedup_events", "stream_user_sessions",
    "stream_static_segment_counts", "csv_landing_daily_stats",
    "incremental_keyset_roundtrip", "medallion_gold_daily",
    "doc_text_quality", "doc_exact_dedup", "doc_train_split",
    "doc_fingerprint_dedup", "doc_token_percentiles", "doc_chunks",
    "chunk_packing", "doc_near_dup_pairs", "doc_dup_clusters",
    "doc_dedup_survivors", "doc_signatures", "doc_signature_table_pairs",
    "doc_simhash_near_dup", "doc_language_guess", "doc_quality_filter",
    "multimodal_byte_features", "knn_brute_force", "knn_ivf",
    "knn_ivf_multiprobe", "embedding_near_dup", "embedding_dup_clusters",
})


# The 50 queries that held the driver window in round 4 (all green in
# CORRECTNESS_r04.json).
R4_WINDOW = frozenset({
    "event_type_stats_salted", "events_asof_reference_value", "user_sessions",
    "event_type_rollup", "purchase_running_total",
    "active_without_purchase_last_day", "event_user_skew_profile",
    "user_session_windows", "orders_with_late_shipments",
    "brand_small_qty_revenue", "event_type_hour_cube", "views_before_purchase",
    "priority_revenue_salted_join", "user_distinct_hll", "event_props_parsed",
    "order_value_window_stats", "repeat_purchasers_first_last_day",
    "daily_purchase_spine", "user_event_type_profile", "event_grouping_sets",
    "user_first_last_events", "daily_activity_reconciliation",
    "lineitem_measures_unpivot", "event_value_histogram",
    "event_value_dispersion", "user_daily_value_interpolated",
    "daily_event_anomalies", "conversion_funnel", "event_value_winsorized",
    "user_retention_cohorts", "event_transition_matrix", "user_distinct_kmv",
    "doc_token_classes", "doc_char_jaccard_pairs",
    "doc_winnow_fingerprint_overlap", "doc_stratified_sample",
    "doc_tfidf_top_terms", "doc_token_percentiles_approx",
    "multimodal_frame_index", "llm_corpus_pipeline", "doc_embedding_profile",
    "knn_ivf_kmeans", "embedding_dedup_survivors", "knn_pq_adc",
    "stream_merge_upsert_roundtrip", "stream_session_windows",
    "stream_view_purchase_join", "stream_purchase_attribution_outer",
    "clustered_time_slice", "sensor_feed_stats",
})


# The 50 queries that held the driver window in round 5 (all green in
# CORRECTNESS_r05.json).
R5_WINDOW = frozenset({
    "llm_corpus_pipeline_v2", "doc_incremental_near_dup", "doc_dup_clusters_twophase",
    "doc_decontamination", "doc_repetition_signals", "doc_unigram_logprob",
    "corpus_language_mixing", "embedding_covariance", "doc_dedup_best_quality",
    "event_props_variant", "json_landing_stats", "orc_roundtrip_stats",
    "order_priority_pivot_native", "sensor_feed_stream_stats", "embedding_covariance_partial",
    "embedding_pca_whitened", "stream_incremental_near_dup", "corpus_token_budget_selection",
    "doc_pii_scrub", "ledger_roundtrip_stats", "zorder_time_user_slice",
    "chunk_dedup_stats", "doc_quality_classifier", "doc_dsir_weights",
    "embedding_semdedup", "doc_weighted_sample", "doc_bigram_logprob",
    "stream_dq_quarantine", "doc_incremental_dup_clusters", "stream_incremental_dup_clusters",
    "pricing_summary", "daily_event_stats", "ingest_watermark",
    "latest_order_per_customer", "top_orders_per_priority", "customer_order_summary",
    "segment_fee_model", "event_orphan_users", "stream_event_hourly_window",
    "stream_dedup_events", "stream_static_segment_counts", "csv_landing_daily_stats",
    "incremental_keyset_roundtrip", "medallion_gold_daily", "doc_fingerprint_dedup",
    "chunk_packing", "doc_quality_filter", "multimodal_byte_features",
    "knn_ivf_multiprobe", "embedding_near_dup",
})

# The 50 queries that held the driver window in round 6 (all green in
# CORRECTNESS_r06.json): the 20 r6 additions + the 30 r3-stale
# re-confirmations.
R6_WINDOW = frozenset({
    "schema_merge_landing_stats", "bootstrap_partitioned_roundtrip",
    "stream_ivf_assignments", "llm_corpus_pipeline_v3", "knn_ivfpq_adc",
    "stream_multihop_topology", "compact_maintenance_stats",
    "stream_event_sliding_window", "stream_pq_codes",
    "corpus_packing_manifest", "event_audience_overlap_kmv",
    "event_heavy_hitters_cms", "orders_bloom_prefilter",
    "jdbc_live_roundtrip", "events_asof_tolerance", "audio_pcm_chunk_stats",
    "customer_top_orders_lateral", "regional_supplier_revenue",
    "doc_prefix_filter_pairs", "purchase_graph_pagerank",
    "order_priority_pivot", "peak_event_hours", "events_from_customers",
    "hourly_value_deviation", "event_cost_model", "event_range_flags",
    "active_ids_union", "order_dup_check", "event_null_profile",
    "urgent_open_orders", "allowed_event_types", "top_value_orders",
    "event_hourly_window", "event_projection_normalize",
    "stream_user_sessions", "doc_text_quality", "doc_exact_dedup",
    "doc_train_split", "doc_token_percentiles", "doc_chunks",
    "doc_near_dup_pairs", "doc_dup_clusters", "doc_dedup_survivors",
    "doc_signatures", "doc_signature_table_pairs", "doc_simhash_near_dup",
    "doc_language_guess", "knn_brute_force", "knn_ivf",
    "embedding_dup_clusters",
})

# The 55 late-r6 registry additions that entered round 7 with no driver
# CORRECTNESS row (builder-verified only: this suite + CORRECTNESS_FULL
# at three SFs). 49 of them take the r7 driver window (the r6 verdict's
# #1 ask); the 6 in R8_PENDING defer one round.
R7_PENDING = frozenset({
    "doc_dup_span_mass",
    "doc_token_pmi",
    "ledger_time_travel_stats",
    "knn_recall_eval",
    "doc_bm25_topk",
    "join_size_ams_estimate",
    "merge_change_feed_stats",
    "stream_cdf_matview",
    "copurchase_triangle_stats",
    "knn_lsh_hamming",
    "user_rolling_distinct_kmv",
    "events_profile_summary",
    "snapshot_diff_stats",
    "doc_char_entropy",
    "scd2_enriched_event_stats",
    "pq_distortion_stats",
    "contrastive_inbatch_pairs",
    "llm_corpus_pipeline_v4",
    "embedding_prototype_eval",
    "customer_rfm_segments",
    "event_ewma_anomalies",
    "doc_split_leakage",
    "doc_weighted_sample_per_lang",
    "bpe_merge_candidates",
    "corpus_zipf_slope",
    "customer_similarity_topk",
    "source_dup_matrix",
    "embedding_dim_profile",
    "source_corpus_profile",
    "vocab_editdist_pairs",
    "basket_association_rules",
    "source_discriminative_terms",
    "event_cusum_changepoints",
    "doc_sorted_neighborhood_pairs",
    "embedding_matryoshka_recall",
    "hybrid_rrf_retrieval",
    "doc_weighted_quality_quantiles",
    "segment_conversion_ztest",
    "benford_price_audit",
    "event_type_trend_slopes",
    "purchase_graph_communities",
    "user_window_funnel",
    "event_value_mad_outliers",
    "daily_seasonal_residuals",
    "customer_revenue_gini",
    "user_conversion_life_table",
    "embedding_cluster_quality",
    "fd_violation_audit",
    "stream_cms_heavy_hitters",
    "table_content_digest",
    "event_value_psi_drift",
    "doc_groupwise_split",
    "user_item_negative_samples",
    "order_leadtime_percentiles",
    "session_bounce_stats",
})


# The 6 R7_PENDING queries the 50-slot r7 window could not hold (49
# pending + the new DQ6 gate fill it), plus any genuinely-new r7
# registry additions. First in line for the r8 window.
R8_PENDING = frozenset({
    "corpus_zipf_slope",
    "benford_price_audit",
    "customer_revenue_gini",
    "fd_violation_audit",
    "order_leadtime_percentiles",
    "session_bounce_stats",
    # new in r7 (registered after the r7 window committed to the
    # pending backlog)
    "scale_conf_advisor",
    "segment_shipping_priority",
    "returned_item_losses",
    "promo_revenue_share",
    "large_volume_customers",
    "corpus_mixture_plan",
    "segment_supplier_affinity_ppr",
    "daily_forecast_backtest",
    "events_in_incident_windows",
    "segment_reach_bfs",
    "purchase_graph_hits",
    "segment_pareto_customers",
    "classifier_calibration_eval",
    "temporal_purchase_reach",
    "incident_concurrency_profile",
    "event_value_bootstrap_ci",
    "event_type_target_encoding",
    "segment_cuped_adjusted_lift",
    "purchase_graph_kcore",
    "segment_did_bootstrap",
    "dpp_partition_pruned_join",
    "uplift_decile_curve",
    "dup_cluster_cohesion_audit",
    "events_asof_nearest",
    "embedding_dbscan_2d",
    "lsh_scurve_eval",
    "session_path_trigrams",
    "purchase_als_rank1",
    "doc_cdc_chunks",
    "event_value_ks_drift",
    "event_type_leadlag",
    "als_recall_eval",
    "purchase_graph_densest",
    "event_type_theilsen_trend",
    "transition_model_eval",
    "vocab_coverage_eval",
    "source_ngram_diversity",
})


def test_gate_window_pinned():
    """The driver records correctness rows for exactly the FIRST 50
    registry entries in iteration order. Pin the ROTATED r7 set: 49 of
    the 55 R7_PENDING late-r6 additions (the only slice that entered r7
    builder-verified-only) plus the new DQ6 expected-cardinality gate —
    closing the r6 verdict's #1/#2 asks. The 6 deferred pending queries
    are pinned in R8_PENDING. A refactor that reorders registration
    (round 2 silently pushed embedding_near_dup and all of §2.7 out of
    the window) must fail HERE, not at the gate."""
    from smartpool_bigdata_spark.queries import GATE_PRIORITY

    names = list(REGISTRY)
    assert len(GATE_PRIORITY) == 50
    assert names[: len(GATE_PRIORITY)] == GATE_PRIORITY

    gated = set(GATE_PRIORITY)
    # prior-window greens stay registered and oracle-checked by this suite
    missing = (R3_WINDOW | R4_WINDOW | R5_WINDOW | R6_WINDOW) - set(names)
    assert not missing, f"driver-green queries dropped from registry: {missing}"
    # FULL coverage: every registry query has a driver window somewhere
    # (or is a declared post-window addition queued for the r8 window)
    covered = gated | R3_WINDOW | R4_WINDOW | R5_WINDOW | R6_WINDOW | R8_PENDING
    uncovered = set(names) - covered
    assert not uncovered, f"queries with no driver window ever: {uncovered}"
    # this window is EXACTLY the pending backlog + the new DQ6 gate:
    # every slot either clears a builder-verified-only query or gates a
    # new operator — re-confirmation resumes in r8
    assert gated - R7_PENDING == {"landing_cardinality_check"}
    assert R7_PENDING - gated == R8_PENDING - _r7_new()
    # R8_PENDING must not rot: only for queries genuinely without a
    # driver row (deferred pending or new-in-r7)
    stale_pending = R8_PENDING & (
        gated | R3_WINDOW | R4_WINDOW | R5_WINDOW | R6_WINDOW
    )
    assert not stale_pending, f"R8_PENDING entries already gated: {stale_pending}"


def _r7_new() -> frozenset:
    """Names first registered in round 7 (no prior window or pending
    slot). Kept separate so the window equation above reads exactly:
    r7 window = 49 × R7_PENDING + the DQ6 gate."""
    return frozenset({
        "landing_cardinality_check",
        "scale_conf_advisor",
        "segment_shipping_priority",
        "returned_item_losses",
        "promo_revenue_share",
        "large_volume_customers",
        "corpus_mixture_plan",
        "segment_supplier_affinity_ppr",
        "daily_forecast_backtest",
        "events_in_incident_windows",
        "segment_reach_bfs",
        "purchase_graph_hits",
        "segment_pareto_customers",
        "classifier_calibration_eval",
        "temporal_purchase_reach",
        "incident_concurrency_profile",
        "event_value_bootstrap_ci",
        "event_type_target_encoding",
        "segment_cuped_adjusted_lift",
        "purchase_graph_kcore",
        "segment_did_bootstrap",
        "dpp_partition_pruned_join",
        "uplift_decile_curve",
        "dup_cluster_cohesion_audit",
        "events_asof_nearest",
        "embedding_dbscan_2d",
        "lsh_scurve_eval",
        "session_path_trigrams",
        "purchase_als_rank1",
        "doc_cdc_chunks",
        "event_value_ks_drift",
        "event_type_leadlag",
        "als_recall_eval",
        "purchase_graph_densest",
        "event_type_theilsen_trend",
        "transition_model_eval",
        "vocab_coverage_eval",
        "source_ngram_diversity",
    })
