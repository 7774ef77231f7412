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

    full = {
        "metric": "staged_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
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
