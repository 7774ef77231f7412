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
