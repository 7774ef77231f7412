"""End-to-end medallion pipeline test: bronze incremental ingest → silver
latest-per-key snapshot/merge with expectations → gold aggregates, asserted
against a DuckDB oracle over the original source rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from smartpool_bigdata_spark.catalog import Catalog, load_table
from smartpool_bigdata_spark.expectations import InSet, NotNull, Suite, Unique
from smartpool_bigdata_spark.pipelines import MedallionPipeline
from tests.conftest import SF_DIR, assert_matches_oracle

def AUDIT_TS():
    return F.lit("2024-02-01 00:00:00").cast("timestamp")


def test_medallion_end_to_end(spark, duck, tmp_path):
    cat = Catalog(root=str(tmp_path))
    pipe = MedallionPipeline(spark, cat)
    events = load_table(spark, SF_DIR, "events")
    customer = load_table(spark, SF_DIR, "customer")

    # bronze: two incremental batches land everything exactly once
    cutoff = events.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    assert pipe.bronze_ingest(
        "events", events.filter(F.col("ts") <= F.lit(cutoff)), "ts",
        pk_col="event_id", audit_source="testdata", audit_ts=AUDIT_TS(),
    )
    assert pipe.bronze_ingest(
        "events", events, "ts", pk_col="event_id",
        audit_source="testdata", audit_ts=AUDIT_TS(),
    )
    assert not pipe.bronze_ingest(  # third run: empty delta short-circuit
        "events", events, "ts", pk_col="event_id", audit_ts=AUDIT_TS(),
    )
    bronze = cat.read(spark, "bronze.events")
    assert bronze.count() == events.count()
    assert "_ingest_ts" in bronze.columns and "_source" in bronze.columns

    # dim snapshot straight to bronze (reference job 02's full-table dims)
    cat.define("bronze", "customer")
    cat.write(customer, "bronze.customer", mode="overwrite")

    # silver: latest-per-key + expectations gate
    silver_events = pipe.silver_snapshot(
        "events",
        keys=["event_id"],
        order_by=[F.col("ts").desc()],
        expectations=Suite(
            [
                NotNull(["event_id", "ts"]),
                Unique(["event_id"]),
                InSet("event_type", ["click", "view", "purchase", "signup", "error"]),
            ]
        ),
    )
    assert silver_events.count() == events.count()
    assert "_ingest_ts" not in silver_events.columns

    silver_cust = pipe.silver_merge(
        "customer", keys=["c_custkey"], order_by=[F.col("c_custkey").desc()],
    )
    assert silver_cust.count() == customer.count()

    # gold: enriched daily metrics, checked against the DuckDB oracle over
    # the ORIGINAL source rows — the whole pipeline must be lossless
    def build(frames):
        ev, cust = frames["silver.events"], frames["silver.customer"]
        joined = ev.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            ev["user_id"] == F.col("c_custkey"),
            "left",
        )
        return joined.groupBy(
            F.col("ts").cast("date").alias("event_date"),
            F.coalesce("c_mktsegment", F.lit("unknown")).alias("segment"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,10)")).cast("double"), 2
            ).alias("total_value"),
        )

    gold = pipe.gold(
        "daily_segment_metrics", build, inputs=["silver.events", "silver.customer"]
    )
    assert_matches_oracle(
        gold,
        duck,
        """
        SELECT CAST(e.ts AS DATE) AS event_date,
               coalesce(c.c_mktsegment, 'unknown') AS segment,
               count(*) AS n_events,
               round(CAST(sum(CAST(e.value AS DECIMAL(38,10))) AS DOUBLE), 2) AS total_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
        """,
    )

    # layout: all three layers under one root
    for layer in ("bronze", "silver", "gold"):
        assert os.path.isdir(os.path.join(str(tmp_path), layer))


def test_silver_merge_upserts_changed_rows(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    pipe = MedallionPipeline(spark, cat)
    v1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a"), (2, "2024-01-01 00:00:00", "b")],
        ["id", "updated_at", "val"],
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    pipe.bronze_ingest("t", v1, "updated_at", pk_col="id", audit_ts=AUDIT_TS())
    pipe.silver_merge("t", keys=["id"], order_by=[F.col("updated_at").desc(), F.col("id").desc()])

    v2 = spark.createDataFrame(
        [(2, "2024-01-02 00:00:00", "b2"), (3, "2024-01-02 00:00:00", "c")],
        ["id", "updated_at", "val"],
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    pipe.bronze_ingest("t", v2, "updated_at", pk_col="id", audit_ts=AUDIT_TS())
    out = pipe.silver_merge("t", keys=["id"], order_by=[F.col("updated_at").desc(), F.col("id").desc()])
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}
