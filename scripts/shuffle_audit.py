"""Shuffle-volume audit: measured bytes, not plan shapes.

plan_audit.py sees the plan (exchange count, join strategies) but not
the DATA: a query can be 0-SMJ and still shuffle 10x its input. This
harness runs each headline query once (warm session, noop sink) and
attributes per-stage runtime metrics from the Spark UI REST API
(/api/v1/.../stages) to the query via stage-id deltas:

* shuffle_write / shuffle_read bytes — the cluster-network cost,
* input_bytes — scan volume AFTER pushdown/pruning (scan efficiency),
* spill_bytes (memory+disk) — partitions that overflowed the executor,
* shuffle_ratio = shuffle_write / max(input, 1) — the number that must
  stay O(1) for a query to survive a 100x scale-up (a ratio >> 1 means
  the query AMPLIFIES its input onto the network: explode/fan-out).

Usage: python scripts/shuffle_audit.py [sf_dir] [name ...]
Prints one line per query (sorted by shuffle_write desc) plus a JSON
summary tail; paste notable rows into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    out = {}
    for status in ("complete", "failed"):
        url = f"{ui}/api/v1/applications/{app_id}/stages?status={status}"
        # no blanket except: an unreachable UI / changed JSON shape must
        # fail LOUDLY — silently returning {} would print 0 MB shuffle
        # and zero spill for every query, which reads as a (false) clean
        # bill of health
        for s in json.load(urllib.request.urlopen(url)):
            out[(s["stageId"], s["attemptId"])] = s
    return out


def measure(spark, sf_dir: str, names: list[str]) -> list[dict]:
    """Run each query to a noop sink on a warm session and attribute
    per-stage byte metrics via stage-id deltas. Importable — this is
    also the engine behind tests/test_shuffle_budget.py's pinned
    per-query ceilings. Failures are returned as {'query', 'error'}
    rows (the CLI prints them; the budget test asserts none)."""
    from smartpool_bigdata_spark.queries import REGISTRY
    from smartpool_bigdata_spark.ops.text import release_signature_caches

    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId
    # retention must cover the whole sweep; default spark.ui.retainedStages
    # is 1000 and a sweep can pass it — detect losses via stage-id gaps
    rows = []
    seen: set = set(_stages(ui, app_id))
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep the sweep going
            rows.append({"query": name, "error": str(e)[:120]})
            # refresh the stage watermark so this query's partial stages
            # are never attributed to the NEXT query's delta
            seen = set(_stages(ui, app_id))
            continue
        wall = time.perf_counter() - t0
        release_signature_caches()
        spark.catalog.clearCache()
        cur = _stages(ui, app_id)
        new = [s for k, s in cur.items() if k not in seen]
        seen = set(cur)
        if not new:
            # a successful noop save always runs >=1 stage; an empty
            # delta means stage attribution is broken (UI retention
            # overflow or REST drift) — fail loudly, don't print zeros
            raise RuntimeError(
                f"no new stages attributed to {name}; "
                "check spark.ui.retainedStages / REST availability"
            )
        rows.append(
            {
                "query": name,
                "wall_s": round(wall, 3),
                "n_stages": len(new),
                "input_mb": round(sum(s["inputBytes"] for s in new) / 1e6, 2),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in new) / 1e6, 2
                ),
                "shuffle_read_mb": round(
                    sum(s["shuffleReadBytes"] for s in new) / 1e6, 2
                ),
                "spill_mb": round(
                    sum(
                        s["memoryBytesSpilled"] + s["diskBytesSpilled"]
                        for s in new
                    )
                    / 1e6,
                    2,
                ),
                "shuffle_ratio": round(
                    sum(s["shuffleWriteBytes"] for s in new)
                    / max(sum(s["inputBytes"] for s in new), 1),
                    3,
                ),
            }
        )
    return rows


def main() -> int:
    from smartpool_bigdata_spark.session import get_spark
    from smartpool_bigdata_spark.queries import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [n for n in REGISTRY if not REGISTRY[n].skip_bench]

    spark = get_spark(app_name="shuffle-audit", master="local[8]")
    spark.sparkContext.setLogLevel("WARN")
    rows = measure(spark, sf_dir, names)

    ok = [r for r in rows if "error" not in r]
    ok.sort(key=lambda r: -r["shuffle_write_mb"])
    hdr = (
        f"{'query':38} {'wall_s':>7} {'input_mb':>9} {'shufW_mb':>9} "
        f"{'shufR_mb':>9} {'spill_mb':>9} {'ratio':>7}"
    )
    print(hdr)
    for r in ok:
        print(
            f"{r['query']:38} {r['wall_s']:>7} {r['input_mb']:>9} "
            f"{r['shuffle_write_mb']:>9} {r['shuffle_read_mb']:>9} "
            f"{r['spill_mb']:>9} {r['shuffle_ratio']:>7}"
        )
    for r in rows:
        if "error" in r:
            print(f"{r['query']:38} ERROR {r['error']}")
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(ok),
        "total_shuffle_write_mb": round(
            sum(r["shuffle_write_mb"] for r in ok), 1
        ),
        "total_input_mb": round(sum(r["input_mb"] for r in ok), 1),
        "total_spill_mb": round(sum(r["spill_mb"] for r in ok), 1),
        "worst_ratio": max((r["shuffle_ratio"] for r in ok), default=0),
        "worst_ratio_query": max(
            ok, key=lambda r: r["shuffle_ratio"], default={"query": None}
        )["query"],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
