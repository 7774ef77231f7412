"""Unit tests for the session factory (no JVM needed — builder confs only)."""

from smartpool_bigdata_spark.session import session_builder


def _conf_map(builder):
    # SparkSession.Builder keeps pending confs in ._options (public API gives
    # no getter pre-getOrCreate); tolerate a rename by failing loudly.
    return dict(builder._options)


def test_local_master_sizes_driver_heap():
    confs = _conf_map(session_builder(master="local[32]"))
    # local[N] = driver and all executor threads share one JVM; the 1g
    # spark-submit default starves 32 concurrent tasks (~13 MB each) and
    # OOMs spill-merges. The factory must size the heap.
    assert confs.get("spark.driver.memory") == "8g"


def test_cluster_master_leaves_driver_heap_alone():
    confs = _conf_map(session_builder(master="yarn"))
    # On a real cluster spark-submit owns executor/driver sizing.
    assert "spark.driver.memory" not in confs


def test_explicit_driver_memory_wins():
    confs = _conf_map(
        session_builder(master="local[4]", extra_confs={"spark.driver.memory": "2g"})
    )
    assert confs["spark.driver.memory"] == "2g"
