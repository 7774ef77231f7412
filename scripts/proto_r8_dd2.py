"""Pin dropDuplicatesWithinWatermark reappearance: duplicate NOT late
(ts >= wm) whose original's state expired (orig_ts + delay < wm) must be
RE-EMITTED; a duplicate of a still-tracked key must be dropped."""
import datetime
import os
import shutil
import tempfile
import uuid

from smartpool_bigdata_spark.session import get_spark
from smartpool_bigdata_spark.streaming import run_available_now

spark = get_spark(master="local[4]")
spark.sparkContext.setLogLevel("ERROR")

batch0 = spark.createDataFrame(
    [(1, datetime.datetime(2024, 1, 1, 0, 0, 0)),   # old; expires 01:00
     (2, datetime.datetime(2024, 1, 1, 9, 50, 0)),  # recent; expires 10:50
     (3, datetime.datetime(2024, 1, 1, 10, 0, 0))], # max -> wm = 09:00
    "event_id int, ts timestamp")
batch1 = spark.createDataFrame(
    [(1, datetime.datetime(2024, 1, 1, 9, 30, 0)),  # >= wm, orig expired -> REAPPEAR?
     (2, datetime.datetime(2024, 1, 1, 9, 40, 0)),  # >= wm, orig tracked -> dropped
     (3, datetime.datetime(2024, 1, 1, 8, 0, 0))],  # < wm -> late-dropped
    "event_id int, ts timestamp")
stage = tempfile.mkdtemp(prefix="proto_dd2_")
src = os.path.join(stage, "src")
os.makedirs(src)
batch0.coalesce(1).write.parquet(os.path.join(src, "f=0"))
batch1.coalesce(1).write.parquet(os.path.join(src, "f=1"))
# pin file order: batch0 strictly older mtime
now = datetime.datetime.now().timestamp()
for sub, off in [("f=0", -120), ("f=1", 0)]:
    d = os.path.join(src, sub)
    for fn in os.listdir(d):
        os.utime(os.path.join(d, fn), (now + off, now + off))
s = (spark.readStream.schema("event_id int, ts timestamp, f int")
     .option("maxFilesPerTrigger", "1").parquet(src))
dd = s.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
name = f"mem_{uuid.uuid4().hex}"
q = run_available_now(dd, name, fmt="memory")
for r in spark.table(name).orderBy("f", "event_id").collect():
    print(r["event_id"], r["ts"], "batch", r["f"])
print("batches run:", q.lastProgress.get("batchId"))
shutil.rmtree(stage, ignore_errors=True)
spark.stop()
