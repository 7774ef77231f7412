"""Unit tests for the session factory (no JVM needed — builder confs only)."""

from smartpool_bigdata_spark.session import _default_local_driver_mem, session_builder


def _conf_map(builder):
    # SparkSession.Builder keeps pending confs in ._options (public API gives
    # no getter pre-getOrCreate); tolerate a rename by failing loudly.
    return dict(builder._options)


def test_local_master_sizes_driver_heap():
    confs = _conf_map(session_builder(master="local[32]"))
    # local[N] = driver and all executor threads share one JVM; the 1g
    # spark-submit default starves 32 concurrent tasks (~13 MB each) and
    # OOMs spill-merges. The factory must size the heap — to half of
    # physical RAM clamped to [1g, 8g], so small CI hosts still launch.
    assert confs.get("spark.driver.memory") == _default_local_driver_mem()
    mb = int(confs["spark.driver.memory"].rstrip("m"))
    assert 1024 <= mb <= 8192


def test_default_driver_mem_clamps(monkeypatch):
    import smartpool_bigdata_spark.session as S

    page = 4096
    vals = {"SC_PAGE_SIZE": page, "SC_PHYS_PAGES": (4 * 2**30) // page}
    monkeypatch.setattr(S.os, "sysconf", lambda k: vals[k])
    assert S._default_local_driver_mem() == "2048m"  # half of 4 GiB
    vals["SC_PHYS_PAGES"] = (256 * 2**30) // page
    assert S._default_local_driver_mem() == "8192m"  # capped
    vals["SC_PHYS_PAGES"] = (1 * 2**30) // page
    assert S._default_local_driver_mem() == "1024m"  # floored

    def boom(_):
        raise OSError("no sysconf")

    monkeypatch.setattr(S.os, "sysconf", boom)
    assert S._default_local_driver_mem() == "8192m"  # fallback = old cap


def test_cluster_master_leaves_driver_heap_alone():
    confs = _conf_map(session_builder(master="yarn"))
    # On a real cluster spark-submit owns executor/driver sizing.
    assert "spark.driver.memory" not in confs


def test_explicit_driver_memory_wins():
    confs = _conf_map(
        session_builder(master="local[4]", extra_confs={"spark.driver.memory": "2g"})
    )
    assert confs["spark.driver.memory"] == "2g"
