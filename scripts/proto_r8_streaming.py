"""Round-8 prototype: empirically pin (a) stateOperators accounting after
an AvailableNow drain, (b) native session_window emit semantics, (c)
dropDuplicatesWithinWatermark reappearance across micro-batches."""
import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from smartpool_bigdata_spark.catalog import load_table
from smartpool_bigdata_spark.session import get_spark
from smartpool_bigdata_spark.streaming import (
    event_time_ltz,
    file_stream,
    run_available_now,
    watermarked_tumbling_agg,
)

SF = "/root/testdata/sf0.001"
spark = get_spark(master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

ev = event_time_ltz(
    load_table(spark, SF, "events").select("ts", "event_type", "value", "user_id", "event_id"),
    "ts",
)
stage = tempfile.mkdtemp(prefix="proto_r8_")
src = os.path.join(stage, "events")
ev.write.parquet(src)

# ---------- (a) state accounting ----------
stream = file_stream(spark, src, ev.schema)
agg = watermarked_tumbling_agg(
    stream, ts_col="ts", watermark="1 hour", duration="1 hour",
    keys=["event_type"], aggs={"n_events": F.count(F.lit(1))},
)
name = f"mem_{uuid.uuid4().hex}"
q = run_available_now(agg, name, fmt="memory")
p = q.lastProgress
so = p.get("stateOperators", [])
print("A) stateOperators:", [(s.get("operatorName"), s.get("numRowsTotal"),
                              s.get("numRowsUpdated"), s.get("numRowsRemoved")) for s in so])
print("A) watermark:", (p.get("eventTime") or {}).get("watermark"))
emitted = spark.table(name).count()
row = ev.agg(F.max("ts").alias("mx")).collect()[0]
mx = row["mx"]
import datetime
cut = mx - datetime.timedelta(hours=1)
wins = ev.select(F.date_trunc("hour", "ts").alias("ws"), "event_type").distinct()
n_open = wins.where(F.col("ws") + F.expr("INTERVAL 1 HOUR") > F.lit(cut)).count()
n_closed = wins.where(F.col("ws") + F.expr("INTERVAL 1 HOUR") <= F.lit(cut)).count()
print(f"A) emitted={emitted} n_closed={n_closed} state_rows={sum(s.get('numRowsTotal',0) for s in so)} n_open={n_open}")

# ---------- (b) native session_window, streaming append ----------
stream2 = file_stream(spark, src, ev.schema)
sess = (
    stream2.withWatermark("ts", "1 hour")
    .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
    .agg(F.count(F.lit(1)).alias("n_events"))
    .select(
        F.col("session_window.start").alias("w_start"),
        F.col("session_window.end").alias("w_end"),
        "user_id", "n_events",
    )
)
name2 = f"mem_{uuid.uuid4().hex}"
q2 = run_available_now(sess, name2, fmt="memory")
got = spark.table(name2)
print("B) emitted sessions:", got.count())
# batch twin: islands with 30-min gap per user
from pyspark.sql import Window
w = Window.partitionBy("user_id").orderBy("ts")
isl = (
    ev.select("user_id", "ts")
    .withColumn("prev", F.lag("ts").over(w))
    .withColumn("new_s", (F.col("prev").isNull() | (F.col("ts").cast("long") - F.col("prev").cast("long") >= 30*60)).cast("int"))
    .withColumn("sid", F.sum("new_s").over(w))
    .groupBy("user_id", "sid")
    .agg(F.min("ts").alias("w_start"),
         (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
         F.count(F.lit(1)).alias("n_events"))
)
closed = isl.where(F.col("w_end") <= F.lit(cut))
print("B) batch-twin closed sessions:", closed.count(), " all sessions:", isl.count())
a = {(r["user_id"], r["w_start"], r["w_end"], r["n_events"]) for r in got.collect()}
b = {(r["user_id"], r["w_start"], r["w_end"], r["n_events"]) for r in closed.collect()}
print("B) emitted == batch-twin-closed:", a == b, "| only-stream:", len(a - b), "only-batch:", len(b - a))
if a != b:
    print("   sample only-stream:", list(a - b)[:3])
    print("   sample only-batch:", list(b - a)[:3])
# gap >= vs >: check a 2-row edge exactly 30 min apart merges or not
edge = spark.createDataFrame(
    [(1, datetime.datetime(2024, 1, 1, 0, 0, 0)),
     (1, datetime.datetime(2024, 1, 1, 0, 30, 0)),
     (1, datetime.datetime(2024, 1, 2, 0, 0, 0))],  # watermark pusher
    "user_id int, ts timestamp")
es = (edge.groupBy(F.session_window("ts", "30 minutes"), "user_id")
      .agg(F.count(F.lit(1)).alias("n")))
print("B) batch session_window exact-gap edge:")
es.show(truncate=False)

# ---------- (c) dropDuplicatesWithinWatermark reappearance ----------
base = ev.select("event_id", "ts", "event_type").limit(0).schema
small = spark.createDataFrame(
    [(1, datetime.datetime(2024, 1, 1, 0, 0, 0), "a"),
     (2, datetime.datetime(2024, 1, 1, 9, 50, 0), "b"),   # recent: within wm at batch2
     (3, datetime.datetime(2024, 1, 1, 10, 0, 0), "c")],  # max of batch1
    "event_id int, ts timestamp, event_type string")
dups = spark.createDataFrame(
    [(1, datetime.datetime(2024, 1, 1, 0, 5, 0), "a"),    # old key: state evicted?
     (2, datetime.datetime(2024, 1, 1, 9, 55, 0), "b")],  # recent key: still in state?
    "event_id int, ts timestamp, event_type string")
stage2 = tempfile.mkdtemp(prefix="proto_r8_dd_")
src2 = os.path.join(stage2, "src")
os.makedirs(src2)
small.coalesce(1).write.parquet(os.path.join(src2, "f=0"))
dups.coalesce(1).write.parquet(os.path.join(src2, "f=1"))
sch = "event_id int, ts timestamp, event_type string, f int"
s3 = (spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(src2))
dd = s3.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
name3 = f"mem_{uuid.uuid4().hex}"
q3 = run_available_now(dd, name3, fmt="memory")
out = spark.table(name3).orderBy("f", "event_id").collect()
print("C) dropDuplicatesWithinWatermark across 2 batches:")
for r in out:
    print("   ", r["event_id"], r["ts"], r["f"])
print("C) lastProgress batches:", q3.lastProgress.get("batchId"))

shutil.rmtree(stage, ignore_errors=True)
shutil.rmtree(stage2, ignore_errors=True)
spark.stop()
