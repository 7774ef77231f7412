"""Iterative graph operators on DataFrames: connected components via
min-label propagation (the "HashMin" algorithm) — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS so a dedup pipeline can keep
one representative per cluster.

Scale: each iteration is one join + one aggregate (two key-shuffles);
iteration count = graph diameter, which for near-dup graphs is tiny (dup
clusters are stars/short chains). Lineage is cut per iteration with
``localCheckpoint`` or the loop would build an exponentially deep plan.
For web-scale graphs with long chains, the alternating large-star/
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond") halves diameter per round; HashMin is the right tool at
dedup-cluster shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Undirected connected components. ``edges`` holds one row per pair;
    returns (node, component) where component = the smallest node id in
    the node's component. Deterministic. Raises if the diameter exceeds
    ``max_iterations`` (no silent partial convergence).
    """
    sym = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
        )
        done = changed.isEmpty()
        labels = new_labels
        if done:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
