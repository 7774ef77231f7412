"""Streaming transformations (T1/T2/T3 watermarked windows, J6/T9
stream-static enrichment, the silver JSON-parse step).

Every function takes and returns DataFrames and is valid on BOTH batch and
streaming inputs — Spark's unified model means the gold window aggregate
tested in batch is byte-for-byte the plan the stream runs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampNTZType

from smartpool_bigdata_spark.ops.relational import tumbling_agg


def event_time_ltz(df: DataFrame, *ts_cols: str) -> DataFrame:
    """Cast TIMESTAMP_NTZ event-time columns to TIMESTAMP (LTZ).

    ``withWatermark`` requires session-local TIMESTAMP
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), but parquet written
    without ``isAdjustedToUTC`` arrives as TIMESTAMP_NTZ under Spark 4's
    NTZ inference. With the engine's UTC session timezone
    (session.BUILDER_CONFS) the cast is a value-identity relabel — no
    wall-clock shift — so watermark arithmetic matches the naive-timestamp
    oracle exactly. No-op for columns already LTZ.
    """
    for c in ts_cols:
        if isinstance(df.schema[c].dataType, TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def watermarked_tumbling_agg(
    df: DataFrame,
    ts_col: str,
    watermark: str,
    duration: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Watermark + tumbling event-time window aggregate (T1/T2).

    Reference: ``withWatermark("sensor_ts", "2 minutes")`` then 1-minute
    windows per pool (``spark-apps/07_kafka_smartpool_sensors.py:89,104-131``).

    Semantics under append output mode (T3): a window emits exactly once,
    when the watermark (max observed event time − ``watermark``) passes its
    end; rows later than the watermark are dropped, bounding state. Scale:
    state is one row per open (window × key) — sized by key cardinality ×
    (watermark / duration), independent of input rate.

    Replay caveat (validated on pyspark 4.1): under
    ``Trigger.AvailableNow`` the whole backlog counts as available at query
    start, so no row is ever "late" during reprocessing —
    ``numRowsDroppedByWatermark`` stays 0 and the emitted set is exactly
    the windows with end <= max(event_time) − delay. Late-drop only fires
    on genuinely late arrivals in a live stream. This makes historical
    replays lossless (desirable) but means late-data tests must use a live
    trigger.
    """
    return tumbling_agg(df.withWatermark(ts_col, watermark), ts_col, duration, keys, aggs)


def stream_static_enrich(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join (J6/T9): enrich a stream against a batch dim.

    Reference: gold 1-min aggregates ⟕ static Silver ``pools_dim``
    (``spark-apps/07_kafka_smartpool_sensors.py:144-151``). The static side
    is planned per micro-batch — a broadcast hash join against the stream
    side, no stream-side shuffle and no streaming state. Note the
    reference-documented staleness semantic (SURVEY §7.4.5): the dim
    snapshot is re-resolved per micro-batch from its source, not frozen at
    query start.

    ``broadcast_dim=False`` is the cluster setting for dims that GROW
    with the corpus (customer-class — see SCALE.md's r10 broadcast
    ledger): per-micro-batch the join then plans off the dim's scan
    stats, broadcasting below the threshold and shuffling above it,
    instead of forcing an executor-memory copy of an unbounded frame.
    """
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    max_lag: str = "1 hour",
    how: str = "inner",
):
    """Stream-stream equi-join with the event-time range constraint that
    bounds both sides' state: rows join only when ``right_ts`` lies within
    ``[left_ts - max_lag, left_ts]``. Beyond the reference's surface
    (which only joined stream↔static); required when BOTH sides are live
    feeds (e.g. sensor readings ⋈ maintenance commands).

    State: each side buffers only rows newer than its watermark minus the
    range bound — without the time condition, Spark must keep EVERY row
    forever, so the range is load-bearing, not an optimization.
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    range_cond = (
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return l.join(r, on & range_cond, how)


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact deduplication by key.

    Without a watermark the dedup state grows forever (every key seen);
    with ``ts_col`` + ``watermark`` the state is GC'd as event time
    advances. ``within_watermark=True`` uses
    ``dropDuplicatesWithinWatermark`` (Spark 3.5+): keys may REAPPEAR once
    older duplicates age past the watermark — the right semantics for
    at-least-once upstream producers where duplicates arrive close
    together, with strictly bounded state. The streaming twin of
    ``ops.relational.dedupe_exact``.
    """
    if ts_col is not None and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(list(keys))
        return df.dropDuplicates([*keys, ts_col])
    return df.dropDuplicates(list(keys))


def parse_json_payload(
    raw_df: DataFrame,
    schema: StructType | str,
    value_col: str = "value",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Kafka/raw bytes → typed columns: the bronze→silver parse step.

    Reference: ``from_json(value.cast("string"), schema).alias("j")`` then
    ``select("j.*")`` (``spark-apps/07_kafka_smartpool_sensors.py:85-88``).
    Malformed payloads yield a NULL struct (→ NULL columns), so a
    downstream not-null expectation quarantines them instead of killing the
    query.
    """
    parsed = raw_df.select(
        *[F.col(c) for c in keep_cols],
        F.from_json(F.col(value_col).cast("string"), schema).alias("__j"),
    )
    return parsed.select(*keep_cols, "__j.*")
