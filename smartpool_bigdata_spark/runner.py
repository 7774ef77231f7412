"""CLI entry points — the engine's ``spark-submit`` surface.

The reference runs its flows as per-job scripts launched by Airflow's
SparkSubmitOperator (``dags/dag_10_smartpool_structured_batch.py:46-56``);
here the same operations are subcommands over the engine library, so any
orchestrator (Airflow, cron, CI) shells out to one module:

    python -m smartpool_bigdata_spark.runner ingest --root /lake \\
        --source /data/events.parquet --name events --ts-col ts --pk-col event_id
    python -m smartpool_bigdata_spark.runner silver --root /lake --name events \\
        --keys event_id --order-desc ts
    python -m smartpool_bigdata_spark.runner query --name pricing_summary \\
        --sf-dir /root/testdata/sf0.01 --show 10
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark(args):
    from smartpool_bigdata_spark.session import get_spark

    return get_spark(app_name=f"smartpool-runner-{args.cmd}", master=args.master)


def cmd_ingest(args) -> int:
    """Bronze incremental ingest (reference job 02 shape)."""
    from smartpool_bigdata_spark.catalog import Catalog
    from smartpool_bigdata_spark.pipelines import MedallionPipeline

    spark = _spark(args)
    pipe = MedallionPipeline(spark, Catalog(root=args.root))
    source = spark.read.parquet(args.source)
    if dict(source.dtypes).get(args.ts_col) == "bigint":
        # ns-epoch parquet timestamp (nanosAsLong) -> µs timestamp
        from smartpool_bigdata_spark.catalog import _normalize_ns_timestamps

        source = _normalize_ns_timestamps(source, {args.ts_col: "bigint"})
    landed = pipe.bronze_ingest(
        args.name, source, args.ts_col, pk_col=args.pk_col, audit_source=args.source
    )
    print(json.dumps({"ingested": landed, "table": f"bronze.{args.name}"}))
    return 0


def cmd_silver(args) -> int:
    """Silver latest-per-key snapshot or merge (reference job 03 shape)."""
    from smartpool_bigdata_spark.catalog import Catalog
    from smartpool_bigdata_spark.pipelines import MedallionPipeline

    spark = _spark(args)
    pipe = MedallionPipeline(spark, Catalog(root=args.root))
    order = [F.col(c).desc() for c in args.order_desc]
    fn = pipe.silver_merge if args.merge else pipe.silver_snapshot
    out = fn(args.name, keys=args.keys, order_by=order)
    print(json.dumps({"rows": out.count(), "table": f"silver.{args.name}"}))
    return 0


def cmd_query(args) -> int:
    """Run a registry query (ad-hoc or orchestrated gold build)."""
    from smartpool_bigdata_spark.queries import REGISTRY

    spark = _spark(args)
    q = REGISTRY[args.name]
    df = q.build(spark, args.sf_dir)
    if args.show:
        df.show(args.show, truncate=False)
    print(json.dumps({"query": args.name, "rows": df.count()}))
    return 0


def cmd_list(args) -> int:
    from smartpool_bigdata_spark.queries import REGISTRY

    for name, q in REGISTRY.items():
        print(f"{name:36s} oracle={'yes' if q.oracle else 'rows-only'}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="smartpool_bigdata_spark.runner")
    p.add_argument("--master", default=None, help="spark master (default local[*])")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="bronze incremental ingest")
    pi.add_argument("--root", required=True)
    pi.add_argument("--source", required=True)
    pi.add_argument("--name", required=True)
    pi.add_argument("--ts-col", required=True)
    pi.add_argument("--pk-col", default=None)
    pi.set_defaults(fn=cmd_ingest)

    ps = sub.add_parser("silver", help="silver latest-per-key snapshot/merge")
    ps.add_argument("--root", required=True)
    ps.add_argument("--name", required=True)
    ps.add_argument("--keys", nargs="+", required=True)
    ps.add_argument("--order-desc", nargs="+", required=True)
    ps.add_argument("--merge", action="store_true")
    ps.set_defaults(fn=cmd_silver)

    pq = sub.add_parser("query", help="run a registry query")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--show", type=int, default=0)
    pq.set_defaults(fn=cmd_query)

    pl = sub.add_parser("list", help="list registry queries")
    pl.set_defaults(fn=cmd_list)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
