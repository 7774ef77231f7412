"""The driver's correctness gate as a parametrized test: every registry
query runs on Spark and its DuckDB oracle twin at sf0.001, compared on
schema + rowcount + order-insensitive values."""

from __future__ import annotations

import pytest

from smartpool_bigdata_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF_DIR)
    if q.oracle is None:
        assert sdf.count() >= 0  # rows-only check, mirroring the driver
        return
    assert_matches_oracle(sdf, duck, q.oracle)


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
