"""Third-decade probe for the recursive-CTE fixpoint family — the r9
verdict's #6 ask: ``segment_reach_bfs_cte`` and ``customer_er_em_params``
were the only iterative shapes without an sf1 measurement (SCALE.md §8
covers triangles/reach/prefix-filter).

Measures, at sf0.01 / sf0.1 / the builder-synthesized sf1 tier
(scripts/gen_probe_sf1.py, /tmp/sf1_probe):

* ``segment_reach_bfs_cte``  — Spark 4 native WITH RECURSIVE BFS
* ``segment_reach_bfs``      — the hand-rolled iterate+localCheckpoint twin
  (so the CTE-vs-hand-rolled gap is quantified at every decade)
* ``customer_er_em_params``  — blocked-pair count -> 10-iteration EM
  recursion over a 1-row state relation

and the structural WORK driving each curve: the symmetrized purchase-graph
edge count + seed count for the BFS pair, and the composite-blocked
candidate-pair count for the EM fit — so a wall-clock decade is
attributable to edge/pair volume, not guessed at.

Wall protocol = probe_sf1.py: min-of-2 with the timer wrapping build()
(the iterative work runs inside build), noop sink, cache drained between
runs.

Usage: python scripts/probe_cte_fixpoint.py [sf1_dir]   (default /tmp/sf1_probe)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _steady(spark, name: str, sf_dir: str) -> float:
    from smartpool_bigdata_spark.queries import REGISTRY

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df = REGISTRY[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
    return round(best, 3)


def bfs_work(spark, sf_dir: str) -> dict:
    """Edge/seed volume of the graph both BFS twins traverse, built
    exactly as the queries build it."""
    from smartpool_bigdata_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    raw = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + 1000000).alias("b"),
        )
        .distinct()
    )
    n_raw = raw.count()
    seeds = (
        cust.where(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
        .distinct()
        .count()
    )
    return {"raw_edges": n_raw, "sym_edges": 2 * n_raw, "seeds": seeds}


def em_work(spark, sf_dir: str) -> dict:
    from smartpool_bigdata_spark.queries import _er_blocked_pairs

    return {"blocked_pairs": _er_blocked_pairs(spark, sf_dir).count()}


def main() -> int:
    from smartpool_bigdata_spark.session import get_spark

    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe"
    tiers = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", sf1_dir),
    ]
    spark = get_spark(app_name="probe-cte-fixpoint", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().write.format(
        "noop"
    ).mode("overwrite").save()

    out = []
    for tier, d in tiers:
        row = {"tier": tier, **bfs_work(spark, d), **em_work(spark, d)}
        for q in (
            "segment_reach_bfs",
            "segment_reach_bfs_cte",
            "customer_er_em_params",
        ):
            row[q + "_s"] = _steady(spark, q, d)
        out.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
