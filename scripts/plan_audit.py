"""Physical-plan audit: for every benched registry query, report the
scale-relevant plan properties — filter pushdown, column pruning, join
strategies, shuffle (Exchange) count, whole-stage codegen spans.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]

This is the ".explain and iterate" loop as a tool: a query whose plan
shows a missing pushdown, an unexpected SortMergeJoin on a dim, or a scan
reading every column is a scale bug even when results are correct.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_plan(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    simple = df._jdf.queryExecution().simpleString()
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan + simple)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan + simple)
    return {
        "exchanges": len(re.findall(r"Exchange ", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\) ", plan))
        ),
        "scan_cols": [len([c for c in s.split(",") if ":" in c]) for s in scans],
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from smartpool_bigdata_spark.queries import REGISTRY
    from smartpool_bigdata_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'query':36s} {'xchg':>4} {'bcast':>5} {'smj':>4} {'wscg':>4} "
          f"{'pushed':>6}  scan_cols")
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        if q.skip_bench:
            continue
        df = q.build(spark, sf_dir)
        df.collect()  # execute so AQE finalizes THIS DataFrame's plan
        a = audit_plan(df)
        flag = " TOP-K" if a["take_ordered"] else ""
        print(
            f"{name:36s} {a['exchanges']:>4} {a['broadcast_joins']:>5} "
            f"{a['sortmerge_joins']:>4} {a['codegen_spans']:>4} "
            f"{a['pushed_filters']:>6}  {a['scan_cols']}{flag}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
