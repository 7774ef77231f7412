"""JDBC sources (S1/S2/S3): full table scan, pushdown subquery, and the
keyset-incremental scan.

All three return a configured ``DataFrameReader`` WITHOUT calling
``.load()``, so option assembly is unit-testable in environments with no
database/driver jar; production callers chain ``.load()``.

Scale notes: a single-connection JDBC read is one partition — fine for the
reference's 6-row dims, wrong for big tables, so ``jdbc_table_reader``
exposes Spark's range-partitioned parallel read (``partitionColumn`` /
``lowerBound`` / ``upperBound`` / ``numPartitions``); each of N executors
then issues its own bounded query. The pushdown/keyset variants ship the
WHERE clause to the database (the predicate never crosses the wire
unevaluated), which is what makes incremental cost proportional to the
delta — see ``state.keyset_query_sql`` for the generated SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession

from smartpool_bigdata_spark.state import keyset_query_sql


def _base(
    spark: SparkSession, url: str, user: str | None, password: str | None,
    driver: str | None, options: dict[str, str] | None,
) -> DataFrameReader:
    reader = spark.read.format("jdbc").option("url", url)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_table_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """Full-table JDBC scan (S1) —
    ``spark-apps/02_ingest_smartpool.py:21-32``. Pass the four
    partitioning options for a parallel range-partitioned read on big
    tables (the reference read 6-row dims and could skip this)."""
    reader = _base(spark, url, user, password, driver, options).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


def jdbc_query_reader(
    spark: SparkSession,
    url: str,
    query: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """Pushdown-subquery scan (S2): the database evaluates ``query`` —
    ``spark-apps/02_ingest_smartpool.py:51-60`` builds
    ``(SELECT * FROM t WHERE updated_at > '…') AS t`` this way."""
    return _base(spark, url, user, password, driver, options).option("query", query)


def jdbc_keyset_reader(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str,
    pk_col: str,
    last_ts: str,
    last_pk: int,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    dialect: str = "sqlserver",
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """Keyset-incremental scan (S3): WHERE ``ts > wm OR (ts = wm AND pk >
    last_pk)`` with the timestamp re-exported as a full-precision string —
    the notebook's datetime2(7)-safe protocol
    (``notebooks/02_ingest_smartpool.ipynb:119-141``)."""
    sql = keyset_query_sql(table, ts_col, pk_col, last_ts, last_pk, dialect)
    return jdbc_query_reader(spark, url, sql, user, password, driver, options)
