"""Staged-query benchmark: times the registry queries EXCLUDED from
bench.py's headline loop (``skip_bench=True`` — real streaming drains,
ingest staging round-trips, signature-table builds), so the whole
registry has a committed timing record (r4 verdict ask #8).

These queries do their work inside ``build`` (fixture writes, stream
startup + AvailableNow drain, foreachBatch MERGEs), so the timed unit is
build + materialization, one run each — bench.py's min-of-2 steady-state
methodology does not apply when staging I/O dominates, and these numbers
are NOT comparable to the headline per-query timings (each includes
writing its own input fixtures). Writes BENCH_STAGED.json and prints one
JSON line in the same compact shape as bench.py.

Usage: [SPARK_GRAFT_SF_DIR=...] [SPARK_GRAFT_CPUS=...] python bench_staged.py
"""

from __future__ import annotations

import json
import os
import sys
import time

from bench import compact_line


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from smartpool_bigdata_spark.queries import REGISTRY
    from smartpool_bigdata_spark.session import get_spark

    spark = get_spark(app_name="smartpool-bench-staged", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # Host-calibration canary + pinned reference (same workload and
    # r8-artifact reference as bench.py; see PERF.md "divide by the
    # canary ratio") so the staged trend line self-normalizes too.
    def _canary_jvm() -> None:
        spark.range(20_000_000).select(
            (F.col("id") % 9973).alias("k"), (F.col("id") % 131).alias("v")
        ).groupBy("k").agg(F.sum("v"), F.count(F.lit(1))).write.format(
            "noop"
        ).mode("overwrite").save()

    canary_jvm = None
    for _ in range(3):
        t0 = time.perf_counter()
        _canary_jvm()
        el = time.perf_counter() - t0
        canary_jvm = el if canary_jvm is None else min(canary_jvm, el)
    CANARY_REF_JVM = 0.634
    host_factor_jvm = canary_jvm / CANARY_REF_JVM

    staged = [name for name in REGISTRY if REGISTRY[name].skip_bench]
    timings: dict[str, float] = {}
    for name in staged:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        from smartpool_bigdata_spark.ops.text import release_signature_caches

        release_signature_caches()
        spark.catalog.clearCache()

    # Apples-to-apples continuity (mirrors bench.py's value_r2_subset):
    # the total over exactly the 33 staged queries round 5 measured
    # (BENCH_STAGED.json @ r5, 223.6 s), so the staged total growing with
    # each round's NEW staged queries is never mistaken for a regression.
    R5_STAGED_SET = {
        "clustered_time_slice", "csv_landing_daily_stats",
        "doc_char_jaccard_pairs", "doc_dedup_best_quality",
        "doc_dedup_survivors", "doc_dup_clusters",
        "doc_dup_clusters_twophase", "doc_incremental_dup_clusters",
        "doc_incremental_near_dup", "doc_signature_table_pairs",
        "doc_winnow_fingerprint_overlap", "embedding_dedup_survivors",
        "embedding_dup_clusters", "incremental_keyset_roundtrip",
        "json_landing_stats", "knn_ivf_kmeans",
        "ledger_roundtrip_stats", "medallion_gold_daily",
        "orc_roundtrip_stats", "sensor_feed_stats",
        "sensor_feed_stream_stats", "stream_dedup_events",
        "stream_dq_quarantine", "stream_event_hourly_window",
        "stream_incremental_dup_clusters", "stream_incremental_near_dup",
        "stream_merge_upsert_roundtrip", "stream_purchase_attribution_outer",
        "stream_session_windows", "stream_static_segment_counts",
        "stream_user_sessions", "stream_view_purchase_join",
        "zorder_time_user_slice",
    }
    full = {
        "metric": "staged_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "value_r5_subset": round(
            sum(v for k, v in timings.items() if k in R5_STAGED_SET), 3
        ),
        "canary_jvm_sec": round(canary_jvm, 3),
        "host_factor_jvm": round(host_factor_jvm, 3),
        "value_r5_subset_normalized": round(
            sum(v for k, v in timings.items() if k in R5_STAGED_SET)
            / host_factor_jvm,
            3,
        ),
        "sf": sf,
    }
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_STAGED.json"
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    print(compact_line(full, full_results="BENCH_STAGED.json"))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
