"""sf1 probe tier (the r7 verdict's #3 ask): measure the 100x point
(vs sf0.01) of the growth curves for the three queries whose cost
tracks PAIR/EDGE volume rather than row volume — the ones the 10x
probes showed super-unit (2.1-2.5x wall at 10x rows):

* ``copurchase_triangle_stats``  — wedge/edge growth
* ``temporal_purchase_reach``    — timestamped-edge growth
* ``doc_prefix_filter_pairs``    — candidate-pair growth

Inputs: /root/testdata/sf0.1 plus a local builder-synthesized sf1 tier
(scripts/gen_probe_sf1.py — marginals matched to the driver's sf0.1,
disclosed in SCALE.md §8). Per query and SF this prints steady-state
wall (min-of-2, noop sink — bench.py methodology) AND the structural
counts (edges, wedges, candidates), so the curve is attributable: a
2x wall at 10x rows with 10x edges is linear-in-edges, not sublinear
magic.

Usage: python scripts/probe_sf1.py [sf0.1_dir sf1_dir]
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
    from smartpool_bigdata_spark.ops.text import release_signature_caches

    best = None
    for _ in range(2):
        # UNLIKE bench.py, the timer wraps build() too: the iterative
        # graph queries run their relaxation joins (localCheckpoint-cut)
        # inside build, and that IS the growth cost being probed.
        t0 = time.perf_counter()
        df = REGISTRY[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        release_signature_caches()
        spark.catalog.clearCache()
    return round(best, 3)


def copurchase_counts(spark, sf_dir: str) -> dict:
    """Edge and oriented-wedge volume of the co-purchase graph, built
    exactly as copurchase_triangle_stats builds it (distinct part pairs
    within an order; wedges counted under the degree-then-id total
    order the query orients by)."""
    from smartpool_bigdata_spark.catalog import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    li2 = li.select(F.col("o"), F.col("p").alias("p2"))
    edges = (
        li.join(li2, "o")
        .filter(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("a"), F.col("p2").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient low-(deg, id) -> high-(deg, id); wedges = sum_v C(outdeg_v, 2)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    oriented = (
        edges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            )
            .otherwise(F.col("b"))
            .alias("lo")
        )
    )
    n_wedges = (
        oriented.groupBy("lo")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("bigint"))
        .collect()[0][0]
    )
    return {"n_edges": n_edges, "n_wedges": int(n_wedges or 0)}


def reach_counts(spark, sf_dir: str) -> dict:
    """Distinct timestamped symmetrized edge volume, as
    temporal_purchase_reach builds it (cust <-> supplier per order date)."""
    from smartpool_bigdata_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    raw = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 1_000_000).alias("dst"),
        F.col("o_orderdate").alias("ts"),
    )
    n = raw.distinct().count()
    return {"n_edges_sym": 2 * n}


def main() -> int:
    from smartpool_bigdata_spark.session import get_spark
    from probe_prefix_filter import probe as prefix_probe

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1_probe"]
    spark = get_spark(app_name="probe-sf1")
    spark.sparkContext.setLogLevel("WARN")

    out = []
    for d in dirs:
        row = {"sf_dir": d}
        row["copurchase_triangle_stats"] = {
            "wall_s": _steady(spark, "copurchase_triangle_stats", d),
            **copurchase_counts(spark, d),
        }
        row["temporal_purchase_reach"] = {
            "wall_s": _steady(spark, "temporal_purchase_reach", d),
            **reach_counts(spark, d),
        }
        pf = prefix_probe(spark, d)
        row["doc_prefix_filter_pairs"] = {
            "wall_s": pf["wall_s"],
            "n_docs": pf["n_docs"],
            "n_candidates": pf["n_candidates"],
            "n_pairs": pf["n_pairs"],
            "lsh_candidates": pf["lsh_candidates"],
        }
        print(json.dumps(row))
        out.append(row)
    if len(out) == 2:
        a, b = out
        ratios = {
            q: {
                k: round(b[q][k] / max(a[q][k], 1e-9), 2)
                for k in a[q]
                if isinstance(a[q][k], (int, float))
            }
            for q in (
                "copurchase_triangle_stats",
                "temporal_purchase_reach",
                "doc_prefix_filter_pairs",
            )
        }
        print(json.dumps({"ratios_sf1_over_sf01": ratios}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
