"""Custom Python data SINK (Spark 4 DataSourceWriter/StreamWriter): the
two-phase commit protocol — staged files invisible until the driver-side
commit publishes them, abort cleanup, streaming exactly-once on batch
replay. io/pyledger.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from smartpool_bigdata_spark.io.pyledger import (
    LedgerStreamWriter,
    _commit_manifests,
    _log_dir,
    _read_head,
    _read_manifest,
    _Staged,
    _write_commit_manifest,
    register_ledger,
)

SCHEMA = "id long, k string, v double"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_ledger(spark)


def _df(spark, n=500):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("k"),
        (F.col("id") * 0.1).alias("v"),
    )


def _read(spark, d):
    return (
        spark.read.format("ledger").schema(SCHEMA).option("path", str(d)).load()
    )


def test_batch_roundtrip_exact(spark, tmp_path):
    d = tmp_path / "ledger"
    df = _df(spark)
    df.repartition(4).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    back = _read(spark, d)
    # lossless incl. doubles (repr shortest round-trip), one committed
    # file per partition, manifest-driven
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    assert len(_read_manifest(str(d))["files"]) == 4
    assert back.rdd.getNumPartitions() == 4  # a split per committed file


def test_append_and_overwrite_modes(spark, tmp_path):
    d = tmp_path / "ledger"
    _df(spark, 100).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    _df(spark, 10).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    assert _read(spark, d).count() == 110
    _df(spark, 7).write.format("ledger").mode("overwrite").option(
        "path", str(d)
    ).save()
    assert _read(spark, d).count() == 7
    # overwrite removed the superseded files from disk, not just the manifest
    data_files = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(data_files) == len(_read_manifest(str(d))["files"])


def test_manifest_log_is_sharded_per_commit(spark, tmp_path):
    """Scale property: each commit writes ONE small manifest listing only
    its own files — no driver-side artifact grows with total table size
    (the pre-r6 single-manifest design rewrote an O(total files) JSON on
    every commit)."""
    d = tmp_path / "ledger"
    for _ in range(3):
        _df(spark, 20).repartition(2).write.format("ledger").mode(
            "append"
        ).option("path", str(d)).save()
    manifests = _commit_manifests(str(d))
    assert len(manifests) == 3
    assert all(len(m["files"]) == 2 for m in manifests)
    assert len(_read_manifest(str(d))["files"]) == 6


def test_overwrite_publishes_before_clearing(spark, tmp_path):
    """Atomicity of overwrite: the HEAD epoch flip is the commit point.
    A manifest written for a FUTURE epoch (the publish-first half) is
    invisible until HEAD moves — so a crash mid-overwrite leaves readers
    the complete OLD table, never an empty or torn one."""
    d = tmp_path / "ledger"
    _df(spark, 30).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    old_epoch = _read_head(str(d))
    # simulate a crash after the new epoch's manifest landed but before
    # the HEAD flip: readers must still see the full old table
    _write_commit_manifest(str(d), old_epoch + 1, ["ghost.jsonl"], None)
    assert _read(spark, d).count() == 30
    # a real overwrite then supersedes everything (incl. the orphan)
    _df(spark, 5).write.format("ledger").mode("overwrite").option(
        "path", str(d)
    ).save()
    assert _read(spark, d).count() == 5
    assert _read_head(str(d)) == old_epoch + 2
    # GC removed every superseded epoch's manifests (the orphan included);
    # only HEAD's remain
    assert {m["epoch"] for m in _commit_manifests(str(d))} == {old_epoch + 2}
    assert os.path.isdir(_log_dir(str(d)))


def test_uncommitted_staged_files_are_invisible(spark, tmp_path):
    """Atomicity: a crash between stage and commit leaves .staged-* files
    that readers must never see."""
    d = tmp_path / "ledger"
    _df(spark, 50).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    with open(d / ".staged-crashed.jsonl", "w") as f:
        f.write('{"id": 777777, "k": "ghost", "v": 1.0}\n')
    rows = _read(spark, d).collect()
    assert len(rows) == 50
    assert all(r["k"] != "ghost" for r in rows)


def test_abort_removes_staged_files(tmp_path):
    d = tmp_path / "ledger"
    os.makedirs(d)
    stg = str(d / ".staged-x.jsonl")
    with open(stg, "w") as f:
        f.write('{"id": 1, "k": "a", "v": 0.5}\n')
    w = LedgerStreamWriter({"path": str(d)})
    w.abort([_Staged(path=stg, rows=1)], 0)
    assert not os.path.exists(stg)
    assert _read_manifest(str(d)) == {"files": [], "batches": []}


def test_stream_write_exactly_once_on_replay(spark, tmp_path):
    """Streaming sink drains via AvailableNow (one commit per micro-batch
    recorded in the manifest); a REPLAYED commit of an already-published
    batch id must publish nothing and drop its staged files — the
    checkpoint-recovery path."""
    src = str(tmp_path / "src")
    d = tmp_path / "ledger"
    ckpt = str(tmp_path / "ckpt")
    df = _df(spark, 400)
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.format("ledger")
        .option("path", str(d))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert _read(spark, d).count() == 400
    batches = _read_manifest(str(d))["batches"]
    assert sorted(batches) == list(range(len(batches))) and len(batches) >= 2

    stg = str(d / ".staged-replay.jsonl")
    with open(stg, "w") as f:
        f.write('{"id": 999999, "k": "dup", "v": 2.0}\n')
    LedgerStreamWriter({"path": str(d)}).commit([_Staged(path=stg, rows=1)], 0)
    assert _read(spark, d).count() == 400  # nothing published twice
    assert not os.path.exists(stg)


def test_vacuum_removes_only_old_orphans(spark, tmp_path):
    """vacuum_staged reclaims crash-leaked staged files past the age
    bound and never touches fresh staged files or committed data."""
    import time as _time

    from smartpool_bigdata_spark.io.pyledger import vacuum_staged

    d = tmp_path / "ledger"
    _df(spark, 30).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    old = d / ".staged-crashed-old.jsonl"
    fresh = d / ".staged-inflight.jsonl"
    for p in (old, fresh):
        with open(p, "w") as f:
            f.write('{"id": 1, "k": "x", "v": 0.1}\n')
    past = _time.time() - 7200
    os.utime(old, (past, past))
    removed = vacuum_staged(str(d), max_age_sec=3600)
    assert removed == 1
    assert not old.exists() and fresh.exists()
    assert _read(spark, d).count() == 30  # committed data untouched


def test_time_travel_retained_overwrite(spark, tmp_path):
    """Epoch time travel: a retain-ed overwrite keeps the superseded
    epoch readable via .option('epoch', E); history() lists both;
    vacuum_epochs() is the deferred GC back to HEAD-only."""
    from smartpool_bigdata_spark.io.pyledger import history, vacuum_epochs

    d = tmp_path / "ledger"
    _df(spark, 40).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    _df(spark, 9).write.format("ledger").mode("overwrite").option(
        "path", str(d)
    ).option("retain", "true").save()

    assert _read(spark, d).count() == 9  # HEAD resolves to the new epoch
    pinned = (
        spark.read.format("ledger").schema(SCHEMA)
        .option("path", str(d)).option("epoch", "0").load()
    )
    assert pinned.count() == 40  # superseded epoch fully readable

    hist = history(str(d))
    assert [h["epoch"] for h in hist] == [0, 1]
    assert [h["is_head"] for h in hist] == [False, True]
    assert all(h["n_commits"] == 1 for h in hist)

    removed = vacuum_epochs(str(d))
    assert removed > 0
    assert _read(spark, d).count() == 9  # HEAD untouched by the vacuum
    assert [h["epoch"] for h in history(str(d))] == [1]
    # the pinned epoch is gone from disk: a fresh epoch-0 read sees nothing
    gone = (
        spark.read.format("ledger").schema(SCHEMA)
        .option("path", str(d)).option("epoch", "0").load()
    )
    assert gone.count() == 0


def test_default_overwrite_still_gcs_eagerly(spark, tmp_path):
    d = tmp_path / "ledger"
    _df(spark, 25).write.format("ledger").mode("append").option(
        "path", str(d)
    ).save()
    _df(spark, 5).write.format("ledger").mode("overwrite").option(
        "path", str(d)
    ).save()
    from smartpool_bigdata_spark.io.pyledger import history

    assert [h["epoch"] for h in history(str(d))] == [1]
    data_files = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(data_files) == len(_read_manifest(str(d))["files"])


def test_batch_replay_dedup_survives_epoch_bump(tmp_path):
    """Streaming exactly-once memory must span epochs: a retained
    batch-mode overwrite bumps HEAD while a stream checkpoint is mid-
    recovery; a HEAD-only batches check would forget the replayed batch
    and double-publish it into the new epoch (ADVICE r6)."""
    from smartpool_bigdata_spark.io.pyledger import (
        _publish,
        _published_batches,
        _write_head,
    )

    d = str(tmp_path / "ledger")
    os.makedirs(d)
    _write_commit_manifest(d, 0, [], batch_id=5)  # batch 5 published in epoch 0
    _write_head(d, 1)  # overwrite (retain=true) bumps HEAD, manifests survive
    assert 5 not in _read_manifest(d)["batches"]  # HEAD-only view forgets...
    assert 5 in _published_batches(d)  # ...the cross-epoch scan does not
    _publish(d, [_Staged(path=str(tmp_path / "nope.jsonl"), rows=3)], batch_id=5)
    # the replay published NOTHING into epoch 1
    assert _read_manifest(d, epoch=1)["files"] == []
    assert len(_commit_manifests(d)) == 1
