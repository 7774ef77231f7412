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
        master="local[8]",
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


def assert_matches_oracle(sdf, duck, sql: str) -> None:
    srows = [r.asDict() for r in sdf.collect()]
    scols = sorted(sdf.columns)
    table = duck.execute(sql).fetch_arrow_table()
    drows = table.to_pylist()
    dcols = sorted(table.column_names)
    assert scols == dcols, f"schema mismatch: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), f"rowcount: spark={len(srows)} duck={len(drows)}"
    sk, dk = normalize_rows(srows, scols), normalize_rows(drows, dcols)
    mism = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mism, f"value mismatch (first 3): {mism[:3]}"
