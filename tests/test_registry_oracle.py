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


def test_gate_window_pinned():
    """The driver records correctness rows for exactly the FIRST 50
    registry entries in iteration order. Pin that set: a refactor that
    reorders registration (round 2 silently pushed embedding_near_dup and
    all of §2.7 out of the window) must fail HERE, not at the gate."""
    from smartpool_bigdata_spark.queries import GATE_PRIORITY

    names = list(REGISTRY)
    assert len(GATE_PRIORITY) == 50
    assert names[: len(GATE_PRIORITY)] == GATE_PRIORITY
    # every streaming/ingest/medallion query — round 2's invisible set —
    # must sit inside the window
    gated = set(GATE_PRIORITY)
    for must in (
        "stream_event_hourly_window",
        "stream_dedup_events",
        "stream_user_sessions",
        "stream_static_segment_counts",
        "csv_landing_daily_stats",
        "incremental_keyset_roundtrip",
        "medallion_gold_daily",
        "embedding_near_dup",
        "doc_signatures",
        "doc_signature_table_pairs",
    ):
        assert must in gated, f"{must} fell outside the 50-row gate window"
