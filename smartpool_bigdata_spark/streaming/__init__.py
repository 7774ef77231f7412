"""Structured Streaming surface (SURVEY.md §2.7 + S7/S8/S15/S16/J6).

The reference's streaming job is Kafka JSON → 4 concurrent queries (bronze
raw, silver parsed+validated, gold 1-minute watermarked window agg, gold
stream-static enriched) — ``spark-apps/07_kafka_smartpool_sensors.py:59-160``.
This package re-expresses that surface as composable pieces:

* ``sources`` — kafka/file/rate stream readers (file source is the
  deterministic test twin of the Kafka source; chaining file sinks mirrors
  the notebook's Delta-as-stream-source pattern, S8).
* ``ops`` — watermarked tumbling aggregation, JSON payload parsing,
  stream-static enrichment; all return plain DataFrames so the SAME plan
  runs batch or streaming (Spark's unified model).
* ``runner`` — sink builders (file/console/memory), bounded runs,
  graceful stop, progress observability.
"""

from smartpool_bigdata_spark.streaming.ops import (
    dedup_stream,
    event_time_ltz,
    parse_json_payload,
    stream_static_enrich,
    stream_stream_join,
    watermarked_tumbling_agg,
)
from smartpool_bigdata_spark.streaming.runner import (
    progress_summary,
    start_foreach_batch_upsert,
    run_available_now,
    run_for,
    start_console,
    start_file_sink,
    start_memory_sink,
    stop_all,
)
from smartpool_bigdata_spark.streaming.sources import (
    file_stream,
    kafka_json_reader,
    rate_stream,
)

__all__ = [
    "dedup_stream",
    "event_time_ltz",
    "file_stream",
    "kafka_json_reader",
    "parse_json_payload",
    "progress_summary",
    "rate_stream",
    "run_available_now",
    "run_for",
    "start_console",
    "start_file_sink",
    "start_foreach_batch_upsert",
    "start_memory_sink",
    "stop_all",
    "stream_static_enrich",
    "stream_stream_join",
    "watermarked_tumbling_agg",
]
