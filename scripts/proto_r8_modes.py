"""Round-8 prototype: pin (a) update-mode emission trace into a memory
sink (one row per changed key per micro-batch, running value), and (b)
complete-mode semantics incl. sort + limit support under AvailableNow."""
import datetime
import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from smartpool_bigdata_spark.session import get_spark
from smartpool_bigdata_spark.streaming import file_stream, run_available_now

spark = get_spark(master="local[4]")
spark.sparkContext.setLogLevel("ERROR")

stage = tempfile.mkdtemp(prefix="proto_modes_")
src = os.path.join(stage, "src")
os.makedirs(src)
rows = [
    (1, "a"), (2, "a"), (3, "b"),          # f=0: a:2 b:1
    (4, "a"), (5, "c"),                    # f=1: a:3 c:1 (b unchanged)
    (6, "b"), (7, "b"), (8, "c"),          # f=2: b:3 c:2 (a unchanged)
]
splits = {0: rows[:3], 1: rows[3:5], 2: rows[5:]}
import time as _t

now = _t.time()
for f, chunk in splits.items():
    d = os.path.join(src, f"f={f}")
    spark.createDataFrame(chunk, "event_id int, k string").coalesce(1).write.parquet(d)
    for fn in os.listdir(d):
        os.utime(os.path.join(d, fn), (now + 60 * f, now + 60 * f))

stream = file_stream(spark, src, "event_id int, k string, f int",
                     max_files_per_trigger=1)

# (a) update mode: emission trace
agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
name = f"mem_{uuid.uuid4().hex}"
run_available_now(agg, name, fmt="memory", output_mode="update")
print("UPDATE trace:")
for r in spark.table(name).orderBy("k", "n").collect():
    print("  ", r)
# expect: a->(2,3), b->(1,3), c->(1,2); n_updates: a=2,b=2,c=2

# (b) complete mode with sort + limit
agg2 = (
    stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    .orderBy(F.desc("n"), "k")
    .limit(2)
)
name2 = f"mem_{uuid.uuid4().hex}"
try:
    run_available_now(agg2, name2, fmt="memory", output_mode="complete")
    print("COMPLETE sort+limit:", spark.table(name2).collect())
except Exception as e:
    print("COMPLETE sort+limit FAILED:", type(e).__name__, str(e)[:200])
    agg3 = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    name3 = f"mem_{uuid.uuid4().hex}"
    run_available_now(agg3, name3, fmt="memory", output_mode="complete")
    print("COMPLETE plain:", spark.table(name3).collect())

shutil.rmtree(stage, ignore_errors=True)
