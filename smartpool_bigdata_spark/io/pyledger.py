"""Custom Python data SINK (Spark 4 ``pyspark.sql.datasource`` writer API)
— the write half of the custom-connector surface that ``pydatasource.py``
covers for reads.

The reference pushes curated rows back out to external systems (JDBC
silver tables, Kafka topics — ``docker-compose.yml:240-345`` infra this
sandbox cannot host), so the *protocol itself* is exercised instead: a
``ledger`` source with the full two-phase commit contract an external
sink needs:

* ``write(iterator)`` runs per PARTITION on executors and stages rows to
  an invisible ``.staged-*.jsonl`` file — the analog of writing to a
  transactional buffer / idempotent producer session;
* ``commit(messages)`` runs ONCE on the driver after every task
  succeeded, atomically publishing the staged files (rename + manifest
  append) — readers only ever see manifest-listed files, so a crash
  between stage and commit leaves garbage but never a torn read;
* ``abort(messages)`` deletes staged files after task/job failure;
* the STREAMING writer's ``commit(messages, batchId)`` is IDEMPOTENT:
  a batch id already in the manifest is skipped wholesale, which is
  exactly-once for foreachBatch-style replays after checkpoint recovery
  (pinned by ``tests/test_pyledger.py``).

Rows are stored as JSON lines (ints/strings/bools/floats — floats via
``repr`` shortest round-trip, so double values survive bit-exactly; the
reader re-parses against the declared schema). A real deployment swaps
the file staging for the external system's transactional API and keeps
the commit-message plumbing unchanged.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _Staged(WriterCommitMessage):
    path: str
    rows: int


def _manifest_path(d: str) -> str:
    return os.path.join(d, "_LEDGER_MANIFEST.json")


def _read_manifest(d: str) -> dict:
    try:
        with open(_manifest_path(d)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"files": [], "batches": []}


def _write_manifest(d: str, manifest: dict) -> None:
    tmp = _manifest_path(d) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(d))  # atomic on POSIX


def _stage_rows(path_dir: str, iterator) -> _Staged:
    os.makedirs(path_dir, exist_ok=True)
    staged = os.path.join(path_dir, f".staged-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _Staged(path=staged, rows=n)


def _publish(d: str, messages, batch_id: int | None = None) -> None:
    manifest = _read_manifest(d)
    if batch_id is not None:
        if batch_id in manifest["batches"]:
            # replayed micro-batch after checkpoint recovery: the batch
            # already published — drop the re-staged files, publish
            # NOTHING twice (exactly-once)
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
            return
        manifest["batches"].append(batch_id)
    for m in messages:
        if m is None or m.rows == 0:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
            continue
        prefix = f"batch-{batch_id}-" if batch_id is not None else "part-"
        final = os.path.join(d, f"{prefix}{uuid.uuid4().hex}.jsonl")
        os.rename(m.path, final)
        manifest["files"].append(os.path.basename(final))
    _write_manifest(d, manifest)


def _abort(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.path):
            os.remove(m.path)


class LedgerWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.dir = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _Staged:  # executor-side, per partition
        return _stage_rows(self.dir, iterator)

    def commit(self, messages) -> None:  # driver-side, once
        if self.overwrite:
            old = _read_manifest(self.dir)
            for fn in old["files"]:
                p = os.path.join(self.dir, fn)
                if os.path.exists(p):
                    os.remove(p)
            _write_manifest(self.dir, {"files": [], "batches": []})
        _publish(self.dir, messages)

    def abort(self, messages) -> None:
        _abort(messages)


class LedgerStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.dir = options["path"]

    def write(self, iterator) -> _Staged:
        return _stage_rows(self.dir, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.dir, messages, batch_id=batchId)

    def abort(self, messages, batchId: int) -> None:
        _abort(messages)


@dataclass
class _LedgerFile(InputPartition):
    path: str


class LedgerReader(DataSourceReader):
    """Reads ONLY manifest-listed files — staged leftovers from crashed
    jobs are invisible, which is the atomicity half of the contract.
    One input partition per committed file (a connector's natural
    splits)."""

    def __init__(self, options: dict, schema: StructType):
        self.dir = options["path"]
        self.schema = schema

    def partitions(self):
        manifest = _read_manifest(self.dir)
        return [
            _LedgerFile(os.path.join(self.dir, fn)) for fn in manifest["files"]
        ] or [_LedgerFile("")]

    def read(self, partition: _LedgerFile):
        if not partition.path or not os.path.exists(partition.path):
            return
        names = [f.name for f in self.schema.fields]
        with open(partition.path) as f:
            for line in f:
                d = json.loads(line)
                yield tuple(d.get(n) for n in names)


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ledger"

    def schema(self):
        # reads must declare the schema (.schema(...)); JSON lines carry
        # no types. Writers get the schema from the DataFrame.
        raise NotImplementedError(
            "ledger reads need an explicit .schema(...)"
        )

    def reader(self, schema: StructType) -> LedgerReader:
        return LedgerReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> LedgerWriter:
        return LedgerWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> LedgerStreamWriter:
        return LedgerStreamWriter(self.options)


def register_ledger(spark) -> None:
    """Idempotent registration: ``df.write.format('ledger')`` /
    ``spark.read.format('ledger').schema(...)``."""
    spark.dataSource.register(LedgerDataSource)
