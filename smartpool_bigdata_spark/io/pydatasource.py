"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's live connectors (Kafka sensor feed, JDBC) cannot run in
this sandbox, so the *extension point itself* is exercised instead: a
fully functional custom source with batch + streaming readers, partitioned
parallel reads, and filter pushdown into the source — the same surface a
REST/queue/proprietary-store connector would implement.

``SensorFeedDataSource`` emits the reference producer's sensor shape
(16 sensors, ~8 % injected anomalies —
``producers/producer_smartpool_sensors.py:29-40``) as a PURE arithmetic
function of ``reading_id``, so any engine can regenerate the exact rows:
the driver's DuckDB oracle does, via ``generate_series`` — giving a
custom connector a full value-hash correctness gate.

Row function (all exact integer/IEEE-double arithmetic):

* ``sensor_id  = reading_id % 16``
* ``temp       = 20.0 + (reading_id * 37 % 1000) / 100.0``
* ``ph         = 6.5  + (reading_id * 53 % 200)  / 100.0``
* ``anomaly    = (reading_id * 7919) % 97 < 8``   (≈ 8.2 %)

Scale notes: ``partitions()`` splits the id range so the read is
parallel (a real connector returns its natural splits — Kafka partitions,
JDBC ranges); ``pushFilters`` trims the range BEFORE partitioning, so a
bounded query never even generates pruned splits — the Python-source
equivalent of parquet min/max pruning. The streaming reader treats
``reading_id`` as the offset, advancing ``rows_per_batch`` per
micro-batch (the ``maxOffsetsPerTrigger`` rate-limit analog, T6).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SENSOR_FEED_SCHEMA = StructType(
    [
        StructField("reading_id", LongType(), False),
        StructField("sensor_id", IntegerType(), False),
        StructField("temp", DoubleType(), False),
        StructField("ph", DoubleType(), False),
        StructField("anomaly", BooleanType(), False),
    ]
)


def sensor_row(i: int) -> tuple:
    """The pure row function — shared by batch and stream readers."""
    return (
        i,
        i % 16,
        20.0 + (i * 37 % 1000) / 100.0,
        6.5 + (i * 53 % 200) / 100.0,
        (i * 7919) % 97 < 8,
    )


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int  # exclusive


def _gen_rows(start: int, end: int):
    for i in range(start, end):
        yield sensor_row(i)


class SensorFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.lo = int(options.get("start", 0))
        self.hi = self.lo + int(options.get("n", 10_000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def pushFilters(self, filters):
        """Trim [lo, hi) from reading_id bound filters; fully honored
        bounds are consumed (not returned), everything else is left for
        Spark to evaluate post-scan."""
        leftover = []
        for f in filters:
            if getattr(f, "attribute", None) == ("reading_id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            leftover.append(f)
        return leftover

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.num_partitions)
        span = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        parts = [
            _IdRange(s, min(s + span, hi)) for s in range(lo, hi, span)
        ] or [_IdRange(lo, lo)]
        return parts

    def read(self, partition: _IdRange):
        return _gen_rows(partition.start, partition.end)


class SensorFeedStreamReader(DataSourceStreamReader):
    """reading_id is the offset.

    ``latestOffset`` must be MONOTONIC across query restarts: a fresh
    reader instance that restarts its cursor from scratch reports a head
    BEHIND the checkpoint's committed offset, and the engine then plans
    batches that re-emit committed rows (reproduced: thousands of
    duplicate rows in the sink after a stop/restart). A real connector
    gets this for free by asking the external system for its head; this
    synthetic feed has no external system, so:

    * with ``progress_path`` set, the emitted head is persisted to that
      sidecar file — the stand-in for the external system's state — and
      a restarted reader resumes from it, advancing ``rows_per_batch``
      per micro-batch (the ``maxOffsetsPerTrigger`` analog, T6; exact in
      steady state — regression-locked by
      ``tests/test_pydatasource.py::test_stream_rate_contract`` — and
      bounded at 2x on the first batch after any number of crashes, via
      the engine-start clamp described in ``latestOffset``);
    * without it, the reader reports the FULL end immediately (one
      batch, no incremental state to lose) — restart-safe by
      construction, just not rate-limited.
    """

    def __init__(self, options: dict):
        self.start = int(options.get("start", 0))
        self.end = self.start + int(options.get("n", 10_000))
        self.rows_per_batch = int(options.get("rows_per_batch", 1_000))
        self.progress_path = options.get("progress_path")

    def initialOffset(self):
        return {"reading_id": self.start}

    def _read_cursor(self) -> int:
        try:
            with open(self.progress_path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return self.start

    def latestOffset(self):
        if not self.progress_path:
            return {"reading_id": self.end}
        # Read-modify-write: the sidecar is advanced HERE, not in
        # commit(). Ideally commit() (post-offset-log) would persist the
        # head so a crash could never leave the sidecar ahead of the
        # checkpoint — but Spark 4.1.2's PythonStreamingSourceRunner was
        # MEASURED (80+ triggers, instrumented) to never invoke commit()
        # on a full DataSourceStreamReader, so a commit-persisted cursor
        # stalls the stream after the first batch. Consequence, and the
        # documented contract: if the driver crashes after this write but
        # before the batch reaches the offset log, the restarted query's
        # FIRST batch spans up to 2x rows_per_batch — and no worse, even
        # across REPEATED crashes in that window: partitions() persists
        # the engine's own start offset (the checkpoint's committed
        # position) to a second sidecar, and the cursor is clamped to at
        # most one batch beyond it, so each crash re-advances the SAME
        # window instead of compounding (no data loss or dup either way —
        # partitions() uses the engine's own start). Steady-state batches
        # are exactly rows_per_batch. commit() below still persists the
        # head as defense-in-depth should a future Spark start invoking
        # it.
        cur = max(self._read_cursor(), self.start)
        eng = self._read_engine_start()
        if eng is not None:
            cur = min(cur, eng + self.rows_per_batch)
        nxt = min(cur + self.rows_per_batch, self.end)
        tmp = f"{self.progress_path}.tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self.progress_path)  # atomic on POSIX
        return {"reading_id": nxt}

    def _read_engine_start(self) -> int | None:
        try:
            with open(f"{self.progress_path}.engine") as f:
                return int(f.read().strip())
        except (OSError, ValueError, TypeError):
            return None

    def partitions(self, start: dict, end: dict):
        if self.progress_path:
            # Record the engine's planned start — on a restart this is the
            # checkpoint's committed offset, which latestOffset uses to
            # clamp sidecar-cursor drift to at most one batch. Within a
            # run starts are monotonic; the restart replay's start equals
            # the checkpoint, so a plain overwrite never regresses below
            # the committed position.
            tmp = f"{self.progress_path}.engine.tmp"
            with open(tmp, "w") as f:
                f.write(str(int(start["reading_id"])))
            os.replace(tmp, f"{self.progress_path}.engine")
        return [_IdRange(start["reading_id"], end["reading_id"])]

    def read(self, partition: _IdRange):
        return _gen_rows(partition.start, partition.end)

    def commit(self, end: dict):
        # Not invoked by Spark 4.1.2 (measured — see latestOffset);
        # kept as defense-in-depth for an engine that starts calling it.
        # MONOTONIC: commit(batch N) may land after latestOffset has
        # already advanced the sidecar to batch N+1's head — writing
        # end_N unconditionally would rewind the cursor and make every
        # other trigger plan an empty batch (halved rate), so only
        # fast-forward, never rewind.
        if self.progress_path:
            head = max(int(end["reading_id"]), self._read_cursor())
            tmp = f"{self.progress_path}.tmp"
            with open(tmp, "w") as f:
                f.write(str(head))
            os.replace(tmp, self.progress_path)  # atomic on POSIX

    def stop(self):
        pass


class SensorFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensor_feed"

    def schema(self):
        return SENSOR_FEED_SCHEMA

    def reader(self, schema: StructType) -> SensorFeedReader:
        return SensorFeedReader(self.options)

    def streamReader(self, schema: StructType) -> SensorFeedStreamReader:
        return SensorFeedStreamReader(self.options)


def register_sensor_feed(spark) -> None:
    """Idempotent registration: ``spark.read.format('sensor_feed')``.

    Also applies the engine's runtime confs: Spark 4.1 refuses to even
    initialize a reader that implements ``pushFilters`` unless
    ``spark.sql.python.filterPushdown.enabled`` is true, and an
    externally created session (e.g. the verification driver's) won't
    have it set.
    """
    from smartpool_bigdata_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    spark.dataSource.register(SensorFeedDataSource)
