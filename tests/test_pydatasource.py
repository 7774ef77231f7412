"""Custom Python data source (Spark 4 pyspark.sql.datasource): batch
partitioned read, filter pushdown INTO the source, and the streaming
offset protocol."""

from __future__ import annotations

import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from smartpool_bigdata_spark.io.pydatasource import (
    SensorFeedReader,
    register_sensor_feed,
    sensor_row,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sensor_feed(spark)


def test_batch_read_matches_row_function(spark):
    df = spark.read.format("sensor_feed").option("n", 2000).load()
    rows = {tuple(r) for r in df.collect()}
    assert rows == {sensor_row(i) for i in range(2000)}
    # parallel: the range is split across partitions
    assert df.rdd.getNumPartitions() == 8


def test_push_filters_trim_range_before_partitioning():
    r = SensorFeedReader({"n": "10000"})
    other = EqualTo(("sensor_id",), 3)  # not a reading_id bound -> leftover
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("reading_id",), 9000), LessThan(("reading_id",), 9500), other]
        )
    )
    assert leftover == [other]
    parts = r.partitions()
    assert parts[0].start == 9000 and parts[-1].end == 9500
    covered = sorted((p.start, p.end) for p in parts)
    for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
        assert e1 == s2  # contiguous, no overlap, no gap


def test_pushed_query_returns_exact_slice(spark):
    df = (
        spark.read.format("sensor_feed")
        .option("n", 10000)
        .load()
        .filter((F.col("reading_id") >= 9990) & (F.col("sensor_id") == 2))
    )
    got = [r["reading_id"] for r in df.collect()]
    want = [i for i in range(9990, 10000) if i % 16 == 2]
    assert got == want


def test_stream_reader_drains_in_rate_limited_batches(spark, tmp_path):
    n, per = 5000, 1000
    stream = (
        spark.readStream.format("sensor_feed")
        .option("n", n)
        .option("rows_per_batch", per)
        .option("progress_path", str(tmp_path / "cursor"))
        .load()
    )
    name = f"t_feed_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= n:
                break
            time.sleep(0.5)
        rows = {tuple(r) for r in spark.table(name).collect()}
    finally:
        q.stop()
    assert rows == {sensor_row(i) for i in range(n)}
    # rate limiting: no single micro-batch exceeded rows_per_batch
    assert all(
        p["numInputRows"] <= per for p in q.recentProgress if p["numInputRows"]
    )


def test_stream_rate_contract(spark, tmp_path):
    """Pin the documented rate contract (io/pydatasource.py latestOffset):
    with a sidecar cursor, EVERY non-empty micro-batch in a crash-free
    run is exactly rows_per_batch (the final remainder batch may be
    smaller). This regression-locks the measured never-invokes-commit()
    behavior of Spark 4.1.2's PythonStreamingSourceRunner — an upgrade
    that starts invoking commit() (or double-plans offsets) shows up here
    as a short or oversized batch, not as a silent rate change."""
    n, per = 5000, 1000
    stream = (
        spark.readStream.format("sensor_feed")
        .option("n", n)
        .option("rows_per_batch", per)
        .option("progress_path", str(tmp_path / "cursor"))
        .load()
    )
    name = f"t_rate_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= n:
                break
            time.sleep(0.5)
        total = spark.table(name).count()
    finally:
        q.stop()
    assert total == n
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"]]
    assert sum(sizes) == n
    # steady state: every batch exactly rows_per_batch (n % per == 0 here,
    # so there is no remainder batch to special-case)
    assert sizes == [per] * (n // per), sizes


def test_crash_window_drift_is_clamped(tmp_path):
    """ADVICE r4: repeated crashes inside the latestOffset->offset-log
    window must NOT compound the sidecar drift. Simulate: each 'crash'
    constructs a fresh reader whose latestOffset advances the sidecar,
    while the engine start (persisted by partitions()) stays pinned at
    the checkpoint's committed offset. The planned head must stay within
    one batch of engine_start + rows_per_batch — i.e. the first
    successful batch is at most 2x rows_per_batch, never (N+1)x."""
    from smartpool_bigdata_spark.io.pydatasource import SensorFeedStreamReader

    prog = str(tmp_path / "cursor")
    opts = {"n": 100_000, "rows_per_batch": 1000, "progress_path": prog}

    r = SensorFeedStreamReader(opts)
    assert r.latestOffset() == {"reading_id": 1000}
    r.partitions({"reading_id": 0}, {"reading_id": 1000})  # batch 0 planned
    assert r.latestOffset() == {"reading_id": 2000}
    # crash here, repeatedly: batch 1 (1000..2000) never reaches the
    # offset log, so the engine start stays 1000 across every restart
    for _ in range(5):
        r_restarted = SensorFeedStreamReader(opts)
        head = r_restarted.latestOffset()["reading_id"]
        assert head <= 3000, "cursor drift compounded across crashes"
        r_restarted.partitions({"reading_id": 1000}, {"reading_id": head})
    # once a batch commits and the engine advances, the clamp follows
    r2 = SensorFeedStreamReader(opts)
    r2.partitions({"reading_id": 3000}, {"reading_id": 3000})
    assert r2.latestOffset()["reading_id"] == 4000


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """A stop/restart from checkpoint must not re-emit committed rows.
    The cursor lives in the progress_path sidecar (the stand-in for a
    real connector's external head), so a fresh reader instance resumes
    monotonically instead of rewinding behind the committed offset —
    the rewind produced thousands of duplicates before the fix."""
    import os

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    prog = str(tmp_path / "cursor")
    n = 100_000

    def start():
        s = (
            spark.readStream.format("sensor_feed")
            .option("n", n)
            .option("rows_per_batch", 1000)
            .option("progress_path", prog)
            .load()
        )
        return (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= 3000:
                break
        except Exception:
            pass
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(20)
    n_before = spark.read.parquet(out).count()
    assert n_before >= 3000

    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.read.parquet(out).count() >= n_before + 5000:
            break
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination(20)
    rows = [r["reading_id"] for r in spark.read.parquet(out).collect()]
    assert len(rows) == len(set(rows)), "restart re-emitted committed rows"
    assert set(rows) == set(range(max(rows) + 1))  # contiguous, no gaps


def test_commit_never_rewinds_cursor(tmp_path):
    """commit(end) is defense-in-depth for engines that invoke it; if it
    lands AFTER latestOffset advanced the sidecar, it must fast-forward
    only — a rewind would make every other trigger plan an empty batch."""
    from smartpool_bigdata_spark.io.pydatasource import SensorFeedStreamReader

    prog = str(tmp_path / "cursor")
    r = SensorFeedStreamReader(
        {"n": 10_000, "rows_per_batch": 1000, "progress_path": prog}
    )
    assert r.latestOffset() == {"reading_id": 1000}  # advances sidecar
    r.commit({"reading_id": 1000})
    assert r._read_cursor() == 1000
    assert r.latestOffset() == {"reading_id": 2000}  # sidecar now 2000
    r.commit({"reading_id": 1000})  # late commit of the PREVIOUS batch
    assert r._read_cursor() == 2000  # no rewind
    r.commit({"reading_id": 3000})  # a future engine committing ahead
    assert r._read_cursor() == 3000
