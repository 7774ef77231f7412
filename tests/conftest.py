from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from smartpool_bigdata_spark.session import get_spark

    import tempfile

    spark = get_spark(
        app_name="smartpool-tests",
        # 16 worker threads (r13): the suite's sweeps submit independent
        # actions from 8-12 driver threads (guide §2.6) and the old
        # local[8] session was the wall-clock ceiling; shuffle stays at
        # 8 partitions so every byte-level pin (shuffle ratios, plan
        # shapes) keeps the round-9 measurement shape.
        master="local[16]",
        extra_confs={
            "spark.sql.shuffle.partitions": "8",
            # keep saveAsTable warehouses out of the repo working tree
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR_ORACLE, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def normalize_rows(rows: list[dict], cols: list[str]) -> list[str]:
    """Order-insensitive, float-tolerant row fingerprint (driver-style)."""
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.6f}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def canon_arrow_type(t) -> str:
    """Canonical type token for an Arrow type (timestamp unit/tz ignored)."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return "double" if t.bit_width == 64 else f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow_type(t.value_type)}>"
    return str(t)


def canon_spark_type(dt) -> str:
    """Same canonical tokens for a Spark DataType, so the two engines'
    OUTPUT TYPES can be compared — the driver's value-hash is typed, and
    round 2's only red row (doc_signatures) was DuckDB widening to
    HUGEINT/INTEGER where Spark emits BIGINT with equal values. The
    stringified row compare below can't see that; this can."""
    from pyspark.sql import types as ST

    if isinstance(dt, ST.ArrayType):
        return f"array<{canon_spark_type(dt.elementType)}>"
    if isinstance(dt, ST.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    s = dt.simpleString()
    return {
        "bigint": "int64",
        "int": "int32",
        "smallint": "int16",
        "tinyint": "int8",
        "float": "float32",
        "timestamp": "timestamp",
        "timestamp_ntz": "timestamp",
    }.get(s, s)


def spark_snapshot(sdf) -> tuple[list[dict], list[str], dict[str, str]]:
    """Collect a Spark frame into the (rows, cols, canonical types)
    triple the oracle comparison needs. Safe to call from a worker
    thread (guide §2.6 — the registry sweep evaluates the Spark side of
    all queries concurrently; DuckDB stays on the main thread)."""
    srows = [r.asDict() for r in sdf.collect()]
    scols = sorted(sdf.columns)
    stypes = {f.name: canon_spark_type(f.dataType) for f in sdf.schema.fields}
    return srows, scols, stypes


def compare_snapshot_to_oracle(snapshot, duck, sql: str) -> None:
    srows, scols, stypes = snapshot
    table = duck.execute(sql).fetch_arrow_table()
    drows = table.to_pylist()
    dcols = sorted(table.column_names)
    assert scols == dcols, f"schema mismatch: spark={scols} duck={dcols}"
    dtypes = {f.name: canon_arrow_type(f.type) for f in table.schema}
    tmism = {
        c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]
    }
    assert not tmism, f"type mismatch (spark, duck): {tmism}"
    assert len(srows) == len(drows), f"rowcount: spark={len(srows)} duck={len(drows)}"
    sk, dk = normalize_rows(srows, scols), normalize_rows(drows, dcols)
    mism = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mism, f"value mismatch (first 3): {mism[:3]}"


def assert_matches_oracle(sdf, duck, sql: str) -> None:
    compare_snapshot_to_oracle(spark_snapshot(sdf), duck, sql)
