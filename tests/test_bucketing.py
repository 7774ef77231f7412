"""Bucketed-table joins: pre-partitioned layout eliminates the join
shuffle entirely — the co-location technique for repeated big-big joins at
100 TB (bucketBy(key) once at write time, every later join on that key
reads co-located buckets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartpool_bigdata_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bucketing_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")

    (ev.write.bucketBy(8, "user_id").sortBy("user_id")
       .mode("overwrite").saveAsTable(f"{bucket_db}.ev_b"))
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
       .mode("overwrite").saveAsTable(f"{bucket_db}.ord_b"))

    left = spark.table(f"{bucket_db}.ev_b")
    right = spark.table(f"{bucket_db}.ord_b")
    # disable auto-broadcast so only bucketing can remove the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, left["user_id"] == right["o_custkey"]).groupBy(
            "user_id"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed sides feed the SortMergeJoin directly: no Exchange below it
        assert "SortMergeJoin" in plan
        join_part = plan[: plan.find("HashAggregate")] if "HashAggregate" in plan else plan
        sm = plan.find("SortMergeJoin")
        below_join = plan[sm:]
        assert "Exchange hashpartitioning" not in below_join

        # sanity: same join on the raw (unbucketed) frames DOES shuffle
        raw = ev.join(orders, ev["user_id"] == orders["o_custkey"]).groupBy(
            "user_id"
        ).agg(F.count(F.lit(1)).alias("n"))
        raw.collect()
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in raw_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_zorder_layout_skips_on_every_key(spark, tmp_path):
    """zorder_write vs linear clustering, measured on parquet footer
    stats: linear (ts-ordered) files are tight on ts but each spans
    ~the WHOLE user_id range; Z-order files are tight-enough on BOTH
    keys that a single-key predicate on either one prunes most files —
    the multi-dimensional skipping Delta's OPTIMIZE ZORDER buys, on
    vanilla parquet."""
    import glob

    import pyarrow.parquet as pq

    from smartpool_bigdata_spark.io.sinks import write_clustered, zorder_write

    ev = load_table(spark, SF_DIR, "events").select(
        # NTZ -> LTZ -> double (epoch seconds); zorder keys must be numeric
        F.col("ts").cast("timestamp").cast("double").alias("t"),
        F.col("user_id").alias("u"),
    )

    def spans(path, col):
        lo = ev.agg(F.min(col)).first()[0]
        hi = ev.agg(F.max(col)).first()[0]
        full = float(hi) - float(lo) or 1.0
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmins, fmaxs = [], []
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                idx = {
                    grp.column(i).path_in_schema: i
                    for i in range(grp.num_columns)
                }[col]
                st = grp.column(idx).statistics
                assert st is not None and st.has_min_max
                fmins.append(st.min)
                fmaxs.append(st.max)
            out.append((float(max(fmaxs)) - float(min(fmins))) / full)
        return out

    lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
    write_clustered(ev, lin, ["t"], n_files=16)
    zorder_write(ev, zo, ["t", "u"], n_files=16)
    assert len(glob.glob(f"{zo}/*.parquet")) >= 8

    lin_u = spans(lin, "u")
    zo_t = spans(zo, "t")
    zo_u = spans(zo, "u")
    # linear-on-t files are blind to u: nearly every file spans ~all of u
    assert sum(lin_u) / len(lin_u) > 0.9
    # z-order files stay narrow on BOTH dimensions (sub-rectangles);
    # mean per-file span well under half the space on each key
    assert sum(zo_t) / len(zo_t) < 0.5, zo_t
    assert sum(zo_u) / len(zo_u) < 0.5, zo_u


def test_zorder_write_preserves_rows(spark, tmp_path):
    """Layout changes must never change data: the Z-ordered table holds
    exactly the input multiset (the curve column is internal and
    dropped)."""
    from smartpool_bigdata_spark.io.sinks import zorder_write

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").cast("double").alias("t"),
        "user_id",
        "value",
    )
    out = str(tmp_path / "z")
    zorder_write(ev, out, cols=["t", "user_id"], n_files=8)
    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(ev.columns)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).isEmpty() and ev.exceptAll(back).isEmpty()
