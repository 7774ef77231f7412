"""Broadcast-growth audit: which queries broadcast frames that GROW
with the corpus?

A broadcast exchange is safe at 100 TB only if its row count is
bounded by construction (an aggregate to #days/#types/#strata rows, a
fixed spine, a capped top-K) or by a genuinely fixed dimension
(region/nation). A frame that broadcasts 10x the rows at 10x the data
is a linear-in-corpus broadcast — it works at test SF and OOMs the
executors at cluster scale, silently, because the plan LOOKS
broadcast-optimal.

This audit runs every batch registry query at two SFs with AQE off,
reads the ``numOutputRows`` metric of every BroadcastExchange in the
executed plan, pairs them by plan position, and reports per-broadcast
growth. Growth ~1x = bounded (safe); growth ~= SF ratio = linear
(flagged). Run:

    python scripts/broadcast_audit.py [sf_small sf_big]

defaults: /root/testdata/sf0.01 /root/testdata/sf0.1 (10x). Output:
one line per query with its per-broadcast (small, big, ratio) triples,
then a FLAGGED section listing broadcasts whose ratio exceeds half the
SF ratio and whose big-side row count exceeds 10k (tiny frames wobble;
a 50-row frame "growing" 5x is not a hazard).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def broadcast_rows(spark, build, sf_dir: str) -> list[int]:
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = build(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    found: list[int] = []

    def _metric(node, key):
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == key:
                return kv._2().value()
        return None

    def _walk(node):
        if node.nodeName() == "BroadcastExchange":
            v = _metric(node, "numOutputRows")
            if v is not None:
                found.append(int(v))
        ch = node.children()
        for i in range(ch.size()):
            _walk(ch.apply(i))

    _walk(plan)
    return found


def main() -> int:
    from smartpool_bigdata_spark.session import get_spark
    from smartpool_bigdata_spark.queries import REGISTRY

    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="broadcast-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    flagged = []
    for name, q in REGISTRY.items():
        if getattr(q, "skip_bench", False):
            continue
        try:
            a = broadcast_rows(spark, q.build, small)
            b = broadcast_rows(spark, q.build, big)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name:40s} ERROR {str(e)[:80]}")
            continue
        if not b:
            continue
        pairs = list(zip(a, b)) if len(a) == len(b) else [(None, x) for x in b]
        desc = " ".join(
            f"{s if s is not None else '?'}->{t}" for s, t in pairs
        )
        print(f"{name:40s} {desc}")
        for s, t in pairs:
            if t > 10_000 and (s is None or s == 0 or t / max(s, 1) > 5.0):
                flagged.append((name, s, t))
        spark.catalog.clearCache()
    print("\nFLAGGED (broadcast rows grow ~linearly and exceed 10k):")
    for name, s, t in flagged:
        print(f"  {name}: {s} -> {t}")
    if not flagged:
        print("  none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
