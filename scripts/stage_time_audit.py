"""Wall-vs-executor time attribution (guide §1.1: decide whether time
goes to compute, shuffle, or the driver/scheduler).

For each named query: noop-sink wall seconds, the SUM of executorRunTime
across its stages, total task count, and the wall fraction not covered
by max-parallel task time. A query whose stage run time is tiny but
whose wall is large is bound by stage-sequencing / AQE replanning /
scheduling latency, not by data work — a different fix than shuffles.

Usage: python scripts/stage_time_audit.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str, app_id: str) -> dict:
    out = {}
    for status in ("complete", "failed"):
        url = f"{ui}/api/v1/applications/{app_id}/stages?status={status}"
        for s in json.load(urllib.request.urlopen(url)):
            out[(s["stageId"], s["attemptId"])] = s
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args

    from smartpool_bigdata_spark.ops.text import release_signature_caches
    from smartpool_bigdata_spark.queries import REGISTRY
    from smartpool_bigdata_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stage-time-audit", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().write.format(
        "noop"
    ).mode("overwrite").save()

    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId
    seen = set(_stages(ui, app_id))
    print(
        f"{'query':36} {'wall_s':>7} {'exec_s':>7} {'cpu_s':>7} "
        f"{'stages':>6} {'tasks':>6}"
    )
    for name in names:
        q = REGISTRY[name]
        best = None
        for _ in range(2):  # min-of-2 like the bench
            df = q.build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            release_signature_caches()
            spark.catalog.clearCache()
            cur = _stages(ui, app_id)
            new = [s for k, s in cur.items() if k not in seen]
            seen = set(cur)
            row = (
                wall,
                sum(s["executorRunTime"] for s in new) / 1e3,
                sum(s["executorCpuTime"] for s in new) / 1e9,
                len(new),
                sum(s["numCompleteTasks"] for s in new),
            )
            if best is None or row[0] < best[0]:
                best = row
        print(
            f"{name:36} {best[0]:>7.3f} {best[1]:>7.3f} {best[2]:>7.3f} "
            f"{best[3]:>6} {best[4]:>6}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
