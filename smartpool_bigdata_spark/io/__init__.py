"""Ingestion sources & sinks (SURVEY §2.1): JDBC (full / pushdown /
keyset-incremental), drift-tolerant CSV landing, and table-maintenance
sinks (merge upsert, schema-merge append, bootstrap, metadata)."""

from smartpool_bigdata_spark.io.csv_landing import (
    drift_tolerant_timestamp,
    read_landing_csv,
)
from smartpool_bigdata_spark.io.jdbc import (
    jdbc_keyset_reader,
    jdbc_query_reader,
    jdbc_table_reader,
)
from smartpool_bigdata_spark.io.sinks import (
    append_with_schema_merge,
    compact_table,
    ensure_table,
    merge_upsert,
    table_detail,
    write_clustered,
)

__all__ = [
    "append_with_schema_merge",
    "compact_table",
    "drift_tolerant_timestamp",
    "ensure_table",
    "jdbc_keyset_reader",
    "jdbc_query_reader",
    "jdbc_table_reader",
    "merge_upsert",
    "write_clustered",
    "read_landing_csv",
    "table_detail",
]
