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
# CORRECTNESS_r03.json). After the r4 rotation they are pytest-oracle-only,
# so pin that they (a) stay registered with an oracle and (b) stay OUT of
# the window — re-gating one would silently evict an r4 query that has no
# driver row yet.
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


def test_gate_window_pinned():
    """The driver records correctness rows for exactly the FIRST 50
    registry entries in iteration order. Pin the ROTATED r4 set: together
    with the r3 rows (R3_WINDOW, all green in CORRECTNESS_r03.json) every
    registry query except the two disclosed twins gets a hard driver
    row across the two rounds. A refactor that reorders registration
    (round 2 silently pushed embedding_near_dup and all of §2.7 out of
    the window) must fail HERE, not at the gate."""
    from smartpool_bigdata_spark.queries import GATE_PRIORITY

    names = list(REGISTRY)
    assert len(GATE_PRIORITY) == 50
    assert names[: len(GATE_PRIORITY)] == GATE_PRIORITY

    gated = set(GATE_PRIORITY)
    # rotation invariant: nothing already proven in r3 consumes an r4 slot
    assert not (gated & R3_WINDOW), gated & R3_WINDOW
    # the r3-green set stays registered and oracle-checked by this suite
    missing = R3_WINDOW - set(names)
    assert not missing, f"r3-green queries dropped from registry: {missing}"
    # across both rounds the only queries without a driver row are (a)
    # disclosed twins — the SAME computation as a driver-green query
    # through an alternative API/algorithm, value-locked by a shared or
    # equivalent oracle — and (b) operators ADDED in r4, first in line
    # for the r5 window rotation
    twins = {
        "order_priority_pivot_native",   # native pivot of order_priority_pivot
        "doc_dup_clusters_twophase",     # large/small-star twin of doc_dup_clusters
        "sensor_feed_stream_stats",      # streaming half of sensor_feed_stats
    }
    r4_additions = {
        "doc_repetition_signals",        # Gopher repetition filters
        "doc_decontamination",           # benchmark n-gram decontamination
        "doc_unigram_logprob",           # unigram-LM quality score
        "corpus_language_mixing",        # alpha=0.3 temperature sampling
        "doc_incremental_near_dup",      # batch-vs-signature-table dedup
        "embedding_covariance",          # distributed covariance (PCA substrate)
        "doc_dedup_best_quality",        # keep-best-per-cluster survivors
        "event_props_variant",           # Spark 4 VariantType parse path
        "orc_roundtrip_stats",           # ORC source/sink round-trip
        "json_landing_stats",            # JSONL landing (µs-lossless)
        "llm_corpus_pipeline_v2",        # r4 curation composition
    }
    uncovered = set(names) - gated - R3_WINDOW
    assert uncovered == twins | r4_additions, uncovered
    # the r2-verdict must-haves for THIS window: the never-driver-checked
    # stream-stream join pair and the r3 additions
    for must in (
        "stream_view_purchase_join",
        "stream_purchase_attribution_outer",
        "stream_merge_upsert_roundtrip",
        "stream_session_windows",
        "clustered_time_slice",
        "sensor_feed_stats",
        "knn_pq_adc",
        "knn_ivf_kmeans",
        "doc_tfidf_top_terms",
        "doc_token_percentiles_approx",
    ):
        assert must in gated, f"{must} fell outside the 50-row gate window"
