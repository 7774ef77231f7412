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
  succeeded, atomically publishing the staged files (rename + commit
  manifest) — readers only ever see manifest-listed files, so a crash
  between stage and commit leaves garbage but never a torn read;
* ``abort(messages)`` deletes staged files after task/job failure;
* the STREAMING writer's ``commit(messages, batchId)`` is IDEMPOTENT:
  a batch id already in the log is skipped wholesale, which is
  exactly-once for foreachBatch-style replays after checkpoint recovery
  (pinned by ``tests/test_pyledger.py``).

Commit log layout (Delta-log-shaped, sharded so nothing driver-side
grows with TOTAL file count — each commit's manifest lists only that
commit's files):

* ``<path>/_ledger_log/commit-<epoch>-<uuid>.json`` — one small JSON per
  commit: ``{"epoch": E, "files": [...], "batch_id": B|null}``;
* ``<path>/_ledger_log/_HEAD.json`` — ``{"epoch": E}``, replaced
  atomically (``os.replace``). Readers only honor manifests whose epoch
  matches HEAD.

Overwrite is publish-first, clear-second: new files are renamed in, a
manifest with epoch E+1 is written, and the atomic HEAD flip E→E+1 is
THE commit point — readers see either the complete old table or the
complete new one, never an empty or torn intermediate. Old-epoch data
files and manifests are garbage-collected only AFTER the flip; a crash
mid-GC leaks unreferenced files, never a bad read.

Time travel (the Delta ``versionAsOf`` / ``DESCRIBE HISTORY`` analog at
epoch granularity): an overwrite with ``.option("retain", "true")``
skips the eager GC, keeping superseded epochs on disk; a read with
``.option("epoch", E)`` pins the manifest resolution to that epoch;
``history(path)`` lists every retained epoch with commit/file/batch
counts; ``vacuum_epochs(path)`` is the deferred GC back to HEAD-only.

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


def _log_dir(d: str) -> str:
    return os.path.join(d, "_ledger_log")


def _head_path(d: str) -> str:
    return os.path.join(_log_dir(d), "_HEAD.json")


def _read_head(d: str) -> int:
    try:
        with open(_head_path(d)) as f:
            return int(json.load(f)["epoch"])
    except (OSError, ValueError, KeyError):
        return 0


def _write_head(d: str, epoch: int) -> None:
    os.makedirs(_log_dir(d), exist_ok=True)
    tmp = _head_path(d) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch}, f)
    os.replace(tmp, _head_path(d))  # atomic on POSIX — THE commit point


def _commit_manifests(d: str, epoch: int | None = None) -> list[dict]:
    """All commit manifests, optionally filtered to one epoch. Each is a
    small per-commit file — nothing here scales with total table size."""
    log = _log_dir(d)
    try:
        names = sorted(
            n for n in os.listdir(log)
            if n.startswith("commit-") and n.endswith(".json")
        )
    except OSError:
        return []
    out = []
    for n in names:
        try:
            with open(os.path.join(log, n)) as f:
                m = json.load(f)
        except (OSError, ValueError):
            continue
        m["_name"] = n
        if epoch is None or m.get("epoch", 0) == epoch:
            out.append(m)
    return out


def _write_commit_manifest(
    d: str, epoch: int, files: list[str], batch_id: int | None
) -> None:
    """Publishing a commit = one atomic rename of its manifest into the
    log. Until this lands, renamed data files are invisible."""
    log = _log_dir(d)
    os.makedirs(log, exist_ok=True)
    name = f"commit-{epoch:010d}-{uuid.uuid4().hex}.json"
    tmp = os.path.join(log, f".tmp-{name}")
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "files": files, "batch_id": batch_id}, f)
    os.replace(tmp, os.path.join(log, name))


def _read_manifest(d: str, epoch: int | None = None) -> dict:
    """Aggregated view of one epoch (default: HEAD) — files visible to
    readers and the set of published streaming batch ids. O(#commits)
    tiny reads, never O(total files) in any single file."""
    if epoch is None:
        epoch = _read_head(d)
    files: list[str] = []
    batches: list[int] = []
    for m in _commit_manifests(d, epoch):
        files.extend(m.get("files", []))
        if m.get("batch_id") is not None:
            batches.append(m["batch_id"])
    return {"files": files, "batches": batches}


def history(d: str) -> list[dict]:
    """Table history, one row per epoch still present in the commit log
    (the ``DESCRIBE HISTORY`` analog; reference usage
    ``notebooks/03_silver_smartpool.ipynb:711-713``): epoch, commit and
    file counts, streaming-batch count, and whether it is the HEAD
    readers resolve by default. With the default (GC-ing) overwrite only
    HEAD remains; ``retain``-ed overwrites keep superseded epochs
    readable via the reader's ``epoch`` option until ``vacuum_epochs``.
    Driver-side O(#commits) tiny reads — never scans data files."""
    head = _read_head(d)
    by_epoch: dict[int, dict] = {}
    for m in _commit_manifests(d):
        e = m.get("epoch", 0)
        row = by_epoch.setdefault(
            e,
            {"epoch": e, "n_commits": 0, "n_files": 0, "n_batches": 0,
             "is_head": e == head},
        )
        row["n_commits"] += 1
        row["n_files"] += len(m.get("files", []))
        if m.get("batch_id") is not None:
            row["n_batches"] += 1
    return [by_epoch[e] for e in sorted(by_epoch)]


def vacuum_epochs(d: str) -> int:
    """Deferred GC for ``retain``-ed overwrites: remove every non-HEAD
    epoch's data files and manifests (Delta's ``VACUUM`` to the current
    version). Returns the number of data files removed. Same crash
    contract as the eager GC path: a crash mid-vacuum leaks unreferenced
    files, never a torn read — visibility is decided only by HEAD."""
    head = _read_head(d)
    n = 0
    for m in _commit_manifests(d):
        if m.get("epoch", 0) == head:
            continue
        for fn in m.get("files", []):
            p = os.path.join(d, fn)
            if os.path.exists(p):
                os.remove(p)
                n += 1
        mp = os.path.join(_log_dir(d), m["_name"])
        if os.path.exists(mp):
            os.remove(mp)
    return n


def _stage_rows(path_dir: str, iterator) -> _Staged:
    os.makedirs(path_dir, exist_ok=True)
    staged = os.path.join(path_dir, f".staged-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _Staged(path=staged, rows=n)


def _rename_in(d: str, messages, batch_id: int | None) -> list[str]:
    """Move staged files to their final names (still invisible — only a
    commit manifest makes them readable). Empty partitions are dropped."""
    finals: list[str] = []
    for m in messages:
        if m is None or m.rows == 0:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
            continue
        prefix = f"batch-{batch_id}-" if batch_id is not None else "part-"
        final = os.path.join(d, f"{prefix}{uuid.uuid4().hex}.jsonl")
        os.rename(m.path, final)
        finals.append(os.path.basename(final))
    return finals


def _published_batches(d: str) -> set[int]:
    """Streaming batch ids published in ANY epoch, not just HEAD.

    The replay-dedup check must survive an epoch bump: a batch-mode
    overwrite that lands while a stream's checkpoint is mid-recovery
    moves HEAD, and a HEAD-only check would forget the replayed batch
    and double-publish it into the new epoch. Scanning every manifest
    keeps the memory as long as the manifests exist; the remaining
    (documented) hole is the NON-retained overwrite, which GCs
    superseded manifests and with them the replay memory — overwrite
    must not interleave with a live/recovering stream on the same path
    unless ``retain=true``."""
    return {
        m["batch_id"]
        for m in _commit_manifests(d)
        if m.get("batch_id") is not None
    }


def _publish(d: str, messages, batch_id: int | None = None) -> None:
    if batch_id is not None and batch_id in _published_batches(d):
        # replayed micro-batch after checkpoint recovery: the batch
        # already published (in ANY epoch) — drop the re-staged files,
        # publish NOTHING twice (exactly-once)
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        return
    finals = _rename_in(d, messages, batch_id)
    _write_commit_manifest(d, _read_head(d), finals, batch_id)


def vacuum_staged(d: str, max_age_sec: float = 24 * 3600) -> int:
    """GC orphaned ``.staged-*`` files older than ``max_age_sec`` — the
    garbage a crash between stage and commit leaves behind (invisible to
    readers by contract; this reclaims the bytes). Manifest-listed files
    are never touched; a conservative age bound keeps in-flight writes
    of a live job safe, same contract as Delta's VACUUM retention.
    Returns the number of files removed."""
    import time

    now = time.time()
    n = 0
    try:
        names = os.listdir(d)
    except OSError:
        return 0
    for fn in names:
        if not fn.startswith(".staged-"):
            continue
        p = os.path.join(d, fn)
        try:
            if now - os.path.getmtime(p) > max_age_sec:
                os.remove(p)
                n += 1
        except OSError:
            pass
    return n


def _abort(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.path):
            os.remove(m.path)


class LedgerWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.dir = options["path"]
        self.overwrite = overwrite
        # retain=true keeps superseded epochs on disk (time travel via
        # the reader's epoch option) instead of eager GC after the flip
        self.retain = str(options.get("retain", "")).lower() == "true"

    def write(self, iterator) -> _Staged:  # executor-side, per partition
        return _stage_rows(self.dir, iterator)

    def commit(self, messages) -> None:  # driver-side, once
        if not self.overwrite:
            _publish(self.dir, messages)
            return
        # Overwrite: publish first, clear second. Readers flip from the
        # complete old epoch to the complete new one at the HEAD replace;
        # a crash anywhere in between leaves the OLD table fully intact.
        # The new epoch is allocated ABOVE every manifest on disk — not
        # just HEAD+1 — so orphans from a crashed prior overwrite are
        # never adopted as visible data.
        others = _commit_manifests(self.dir)
        new_epoch = (
            max([_read_head(self.dir)] + [m.get("epoch", 0) for m in others]) + 1
        )
        finals = _rename_in(self.dir, messages, None)
        _write_commit_manifest(self.dir, new_epoch, finals, None)
        _write_head(self.dir, new_epoch)  # ← commit point
        if self.retain:
            # superseded epochs stay readable (.option("epoch", E)) and
            # listed by history(); vacuum_epochs() is the deferred GC
            return
        # GC every superseded epoch, orphans included (crash here leaks
        # unreferenced files, never a torn read)
        for m in others:
            for fn in m.get("files", []):
                p = os.path.join(self.dir, fn)
                if os.path.exists(p):
                    os.remove(p)
            mp = os.path.join(_log_dir(self.dir), m["_name"])
            if os.path.exists(mp):
                os.remove(mp)

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
    """Reads ONLY manifest-listed files of the HEAD epoch — staged
    leftovers from crashed jobs and superseded epochs are invisible,
    which is the atomicity half of the contract. One input partition per
    committed file (a connector's natural splits)."""

    def __init__(self, options: dict, schema: StructType):
        self.dir = options["path"]
        self.schema = schema
        # time travel: pin reads to a retained epoch (versionAsOf analog,
        # epoch granularity). Default: resolve HEAD at planning time.
        self.epoch = int(options["epoch"]) if "epoch" in options else None

    def partitions(self):
        manifest = _read_manifest(self.dir, self.epoch)
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
