"""Incremental-ingest state: watermark stores and keyset predicates.

The reference keeps single-row Delta tables under ``_state/`` holding the
last ingest watermark (``spark-apps/02_ingest_smartpool.py:17,34-42``), and
its hardest-won lesson is timestamp precision: SQL Server ``datetime2(7)``
watermarks round-tripped through Spark TimestampType lost fractional
digits, silently re-ingesting or skipping rows
(``ProyectoFinal_ASBD_PMD_IVHG/main.tex:150``, ``NOTAS.md:3``). The fix the
notebook landed on — and the protocol here — is:

* watermarks are stored and compared as **strings** (never parsed into a
  lossy type), with ``CONVERT(varchar(33), ..., 126)``-style full precision
  (``notebooks/02_ingest_smartpool.ipynb:119-141``);
* the incremental predicate is a **keyset**: ``ts > last_ts OR (ts =
  last_ts AND pk > last_pk)`` so equal-timestamp rows are neither skipped
  nor double-ingested (:127-128).

Scale: the state doc is one row — reading it is a driver-side metadata op;
the predicate it generates is pushed down (to the JDBC source as SQL, to
parquet as a min/max-pruned filter), so an incremental run's cost is
proportional to the delta, not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# 26 chars: "yyyy-MM-dd HH:mm:ss.SSSSSS" — full Spark µs precision.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


class WatermarkStore:
    """Named single-row state documents under ``<root>/_state/<name>``.

    Three protocols, mirroring the reference's three flows (§3.1-3.2):
    ``last_ts`` (string timestamp), ``keyset`` (string timestamp + pk),
    ``last_date`` (date string). Parquet-backed; a literal-DataFrame source
    (S17) written with overwrite — same shape as
    ``spark.createDataFrame([(ts,)], ["last_execution"])`` in the
    reference (``spark-apps/02_ingest_smartpool.py:40-42``).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, "_state", name)

    def _read_row(self, name: str):
        try:
            rows = self.spark.read.parquet(self._path(name)).limit(1).collect()
        except Exception:
            return None
        return rows[0] if rows else None

    def _write_row(self, name: str, data: list[tuple], cols: list[str]) -> None:
        df = self.spark.createDataFrame(data, cols)
        df.coalesce(1).write.mode("overwrite").parquet(self._path(name))

    # -- last_ts protocol ---------------------------------------------------
    def read_last_ts(self, name: str) -> str | None:
        row = self._read_row(name)
        return row["last_ts"] if row else None

    def write_last_ts(self, name: str, last_ts: str) -> None:
        self._write_row(name, [(last_ts,)], ["last_ts"])

    # -- keyset protocol ----------------------------------------------------
    def read_keyset(self, name: str) -> tuple[str, int] | None:
        row = self._read_row(name)
        return (row["last_ts"], row["last_pk"]) if row else None

    def write_keyset(self, name: str, last_ts: str, last_pk: int) -> None:
        self._write_row(name, [(last_ts, last_pk)], ["last_ts", "last_pk"])

    # -- last_date protocol -------------------------------------------------
    def read_last_date(self, name: str) -> str | None:
        row = self._read_row(name)
        return row["last_date"] if row else None

    def write_last_date(self, name: str, last_date: str) -> None:
        self._write_row(name, [(last_date,)], ["last_date"])


def ts_string(col: Column | str) -> Column:
    """Render a timestamp column as a full-precision string watermark."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT)


def keyset_predicate(
    ts_col: str, pk_col: str | None, last_ts: str, last_pk: int | None = None
) -> Column:
    """Column predicate ``ts > wm OR (ts = wm AND pk > last_pk)``.

    The comparison casts the STRING watermark to timestamp on the engine
    side — exact at µs precision — never the reverse (parsing engine
    timestamps into a client type is where the reference lost digits).
    """
    wm = F.lit(last_ts).cast("timestamp")
    newer = F.col(ts_col) > wm
    if pk_col is None or last_pk is None:
        return newer
    return newer | ((F.col(ts_col) == wm) & (F.col(pk_col) > F.lit(last_pk)))


def keyset_query_sql(
    table: str,
    ts_col: str,
    pk_col: str,
    last_ts: str,
    last_pk: int,
    dialect: str = "sqlserver",
) -> str:
    """Pushdown SQL for a JDBC keyset-incremental scan (S3).

    Mirrors the notebook's generated query
    (``notebooks/02_ingest_smartpool.ipynb:125-136``): strictly-newer OR
    equal-ts-higher-pk, with the timestamp re-exported at source precision
    (``CONVERT(varchar(33), ts, 126)`` on SQL Server) so the NEXT watermark
    is also lossless.
    """
    if dialect == "sqlserver":
        ts_literal = f"CAST('{last_ts}' AS datetime2(7))"
        ts_export = f"CONVERT(varchar(33), {ts_col}, 126) AS {ts_col}_str"
    elif dialect == "derby":
        # Derby (embedded, ships with Spark — the live-tested dialect):
        # Spark's JDBC writer creates case-sensitive quoted identifiers,
        # so every column reference must be double-quoted or Derby
        # uppercases it into a miss; CAST(ts AS VARCHAR) preserves
        # microseconds (round-trip pinned by the live test).
        ts_literal = f"CAST('{last_ts}' AS TIMESTAMP)"
        return (
            f'SELECT t.*, CAST("{ts_col}" AS VARCHAR(33)) AS "{ts_col}_str" '
            f"FROM {table} t "
            f'WHERE "{ts_col}" > {ts_literal} '
            f'OR ("{ts_col}" = {ts_literal} AND "{pk_col}" > {last_pk})'
        )
    else:  # ansi
        ts_literal = f"CAST('{last_ts}' AS TIMESTAMP)"
        ts_export = f"CAST({ts_col} AS varchar(33)) AS {ts_col}_str"
    return (
        f"SELECT *, {ts_export} FROM {table} "
        f"WHERE {ts_col} > {ts_literal} "
        f"OR ({ts_col} = {ts_literal} AND {pk_col} > {last_pk})"
    )


def read_increment(
    source_df: DataFrame,
    store: WatermarkStore,
    name: str,
    ts_col: str,
    pk_col: str | None = None,
) -> DataFrame:
    """Filter ``source_df`` to rows strictly after the stored watermark
    (keyset tie-break when ``pk_col`` is given). First run (no state) reads
    everything. The returned plan carries a plain comparison predicate, so
    Catalyst pushes it to the scan (JDBC WHERE / parquet min-max pruning).
    """
    if pk_col is not None:
        state = store.read_keyset(name)
        if state is None:
            return source_df
        return source_df.filter(keyset_predicate(ts_col, pk_col, state[0], state[1]))
    last_ts = store.read_last_ts(name)
    if last_ts is None:
        return source_df
    return source_df.filter(keyset_predicate(ts_col, None, last_ts))


def advance_watermark(
    delta_df: DataFrame,
    store: WatermarkStore,
    name: str,
    ts_col: str,
    pk_col: str | None = None,
) -> str | None:
    """Advance the stored watermark to the delta's max (ts[, pk-at-max-ts]).

    Call AFTER the delta has landed downstream — the reference's order
    (Bronze append ``spark-apps/02_ingest_smartpool.py:67-72`` THEN state
    overwrite :74-76), which makes a failed downstream write retryable
    (at-least-once) instead of silently skipping rows. Returns the new
    watermark string, or None when the delta was empty (state untouched —
    the empty-input short-circuit, :62-64).
    """
    agg = [F.max(ts_string(ts_col)).alias("ts")]
    if pk_col is not None:
        agg.append(F.max_by(F.col(pk_col), F.struct(ts_col, pk_col)).alias("pk"))
    head = delta_df.agg(*agg).collect()[0]
    if head["ts"] is None:
        return None
    if pk_col is not None:
        store.write_keyset(name, head["ts"], head["pk"])
    else:
        store.write_last_ts(name, head["ts"])
    return head["ts"]


def incremental_ingest(
    source_df: DataFrame,
    store: WatermarkStore,
    name: str,
    ts_col: str,
    write_fn,
    pk_col: str | None = None,
) -> bool:
    """Full ingest step: read increment → land it via ``write_fn(delta)`` →
    advance watermark. Returns False (and leaves state untouched) when the
    increment is empty. The engine twin of the reference's per-table ingest
    loop (``spark-apps/02_ingest_smartpool.py:34-76``).
    """
    delta = read_increment(source_df, store, name, ts_col, pk_col)
    if delta.isEmpty():
        return False
    delta = delta.localCheckpoint(eager=True)  # pin rows: source may move on
    write_fn(delta)
    advance_watermark(delta, store, name, ts_col, pk_col)
    return True
