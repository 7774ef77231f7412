"""Streaming sources (S7 Kafka, S8 table-as-stream via file source, rate).

The Kafka reader is a config builder: it returns a fully-configured
``DataStreamReader`` without calling ``.load()`` so the options surface is
unit-testable in environments without the Kafka connector jar; callers in a
real deployment call ``.load()`` on the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader
from pyspark.sql.types import StructType


def kafka_json_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 2000,
    fail_on_data_loss: bool = False,
) -> DataStreamReader:
    """Kafka streaming source config (S7).

    Mirrors ``spark-apps/07_kafka_smartpool_sensors.py:59-65`` plus the
    notebook's resilience options (``failOnDataLoss=false``,
    ``maxOffsetsPerTrigger`` — ``notebooks/07_kafka_smartpool_sensors.ipynb:279-286``).
    Rate capping (T6) bounds per-micro-batch work so one slow trigger can't
    snowball; essential back-pressure at production rates.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source — the deterministic test twin of Kafka,
    and the engine's analog of the notebook's Delta-as-stream-source
    chaining (S8, ``notebooks/07_kafka_smartpool_sensors.ipynb:239,298,387``):
    a directory written by one streaming query is readable as the unbounded
    source of the next (bronze→silver→gold multi-hop).

    ``maxFilesPerTrigger`` is the file-source form of rate limiting (T6) and
    the lever that makes watermark emission deterministic in tests: one
    chronological file per micro-batch → a known watermark trajectory.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Built-in rate source — load/soak harness for sink throughput."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
