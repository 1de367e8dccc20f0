"""Parquet-backed provenance ledgers: `runs` and `runstatus`.

Reproduces the reference's MySQL tables and their upsert semantics
(reference runs.sql:1-12, Runs.scala:77-116; runstatus.sql:1-12,
RunStatus.scala:56-128) on plain Parquet:

- upsert on the unique key = old.antiJoin(new, key).union(new), written as a
  NEW versioned directory (`v=N+1`) — no read-modify-overwrite of the
  directory being scanned, and the previous version remains readable until
  the new one is committed (poor-man's snapshot isolation; Delta MERGE INTO
  is the drop-in upgrade where the dependency is allowed);
- CONCURRENT writers are safe: every read-merge-write cycle runs under an
  exclusive flock on `<table>/.lock`, so two simultaneous upserts serialize
  and neither loses the other's rows — the semantics the reference gets for
  free from MySQL's ON DUPLICATE KEY UPDATE (Runs.scala:93-102). flock is
  released by the OS on process death (no stale-lock protocol needed), and
  the ledger is constrained to the local filesystem (checked below), where
  flock is reliable. Readers never take the lock: they see the last
  committed version. An object-store deployment swaps this class for a
  transactional table format;
- `RunStatus.insert` on an existing key RESETS started/ended to NULL
  (RunStatus.scala:79-83 — pinned by the ported RunsStatusTest).

The ledger is metadata (one row per processed input-output), orders of
magnitude smaller than the data, so these merges stay cheap at any scale.
"""

from __future__ import annotations

import os
import re
from contextlib import contextmanager
from datetime import datetime, timezone
from typing import Optional

try:  # POSIX only; the sandbox and every target deployment are Linux
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX fallback, best effort
    fcntl = None  # type: ignore[assignment]

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .inputs import Input

RUNS_SCHEMA = T.StructType(
    [
        T.StructField("project", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("input", T.StringType(), False),
        T.StructField("version", T.TimestampType(), False),
        T.StructField("output", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

RUNSTATUS_SCHEMA = T.StructType(
    [
        T.StructField("project", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("output", T.StringType(), False),
        T.StructField("started", T.TimestampType(), True),
        T.StructField("ended", T.TimestampType(), True),
        T.StructField("created", T.TimestampType(), False),
    ]
)


def utc_now() -> datetime:
    """UTC wall clock (reference pins UTC everywhere: Implicits.scala:16)."""
    return datetime.now(timezone.utc).replace(tzinfo=None)


class _VersionedTable:
    """A Parquet table stored as versioned subdirectories `v=N`; the
    current state is the highest N. Writes create N+1."""

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType):
        # version discovery/GC walks the local filesystem (os.listdir /
        # shutil) while reads/writes go through Spark — a remote path would
        # list nothing and then collide on v=0. Fail loudly instead.
        if re.match(r"^[a-z][a-z0-9+.-]*://", path) and not path.startswith(
            "file://"
        ):
            raise ValueError(
                f"ledger path must be on the local filesystem, got {path!r}; "
                "for object-store ledgers use a transactional table format "
                "(e.g. Delta MERGE INTO) instead of the versioned-directory "
                "ledger"
            )
        self.spark = spark
        self.path = path[len("file://"):] if path.startswith("file://") else path
        self.schema = schema

    @contextmanager
    def locked(self):
        """Exclusive writer lock for one read-merge-write cycle.

        flock on `<table>/.lock`: mutual exclusion across processes AND
        across threads of one process (each holder opens its own fd, and
        flock serializes per open file description). Reentrancy is not
        needed — every public mutator takes the lock exactly once.
        """
        if fcntl is None:  # pragma: no cover - non-POSIX
            yield
            return
        os.makedirs(self.path, exist_ok=True)
        fd = open(os.path.join(self.path, ".lock"), "a")
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            fd.close()

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(m.group(1))
            for d in os.listdir(self.path)
            if (m := re.fullmatch(r"v=(\d+)", d))
        )

    def exists(self) -> bool:
        return bool(self._versions())

    def migrate(self) -> None:
        """CREATE TABLE IF NOT EXISTS (reference Runs.scala:36-45)."""
        with self.locked():
            if not self.exists():
                # losing the publish race means someone else migrated —
                # exactly the IF NOT EXISTS semantics, so ignore the loss
                # (real failures propagate out of _publish; verify the
                # IF-NOT-EXISTS outcome all the same)
                staged = self._stage(self.spark.createDataFrame([], self.schema))
                if not self._publish(staged, 0) and not self.exists():
                    raise RuntimeError(
                        f"ledger migrate lost the v=0 race at {self.path!r}"
                        " but no version exists afterwards"
                    )

    def drop(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)

    def read(self) -> DataFrame:
        return self._read_version((self._versions() or [-1])[-1])

    def _read_version(self, v: int) -> DataFrame:
        if v < 0:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(f"{self.path}/v={v}")

    # ------------------------------------------------- CAS commit protocol
    #
    # A write is STAGE then PUBLISH:
    #   stage   — write the merged table to a hidden `.staged-<uuid>` dir
    #             (invisible to readers: version discovery matches `v=N`);
    #   publish — atomically install the staged dir as `v=base+1`, failing
    #             if that version already exists (someone else committed
    #             first). Locally the primitive is os.rename, which the
    #             kernel refuses atomically when the destination is a
    #             non-empty directory; on an object store the same seam is
    #             a conditional put (S3 If-None-Match / GCS
    #             x-goog-if-generation-match:0) of the version's commit
    #             marker. _publish is the ONLY primitive a remote backend
    #             needs to override.
    #
    # A failed publish means the snapshot the merge read is stale: the
    # caller re-reads the (new) latest version, re-merges, and retries —
    # optimistic concurrency, no lock required for correctness. flock
    # remains as the LOCAL fast path so co-located writers serialize
    # without burning merge work on doomed attempts; the CAS loop beneath
    # it is what survives deployments where flock does not exist
    # (reference gets both properties from MySQL ON DUPLICATE KEY UPDATE,
    # Runs.scala:93-102).

    _CAS_MAX_RETRIES = 16

    def _stage(self, df: DataFrame) -> str:
        import shutil
        import uuid

        staged = os.path.join(self.path, f".staged-{uuid.uuid4().hex}")
        try:
            # ledger is metadata-sized: one file keeps listing cheap
            df.coalesce(1).write.mode("errorifexists").parquet(staged)
        except Exception:
            # a failed/aborted write (expired pinned snapshot, executor
            # death) must not abandon a half-written .staged-* orphan on
            # the shared ledger path
            shutil.rmtree(staged, ignore_errors=True)
            raise
        return staged

    def _publish(self, staged: str, version: int) -> bool:
        import errno
        import shutil

        try:
            os.rename(staged, os.path.join(self.path, f"v={version}"))
            return True
        except OSError as e:
            # Two errnos are lost races; the rest are genuine failures
            # that must propagate, not read as "someone else committed"
            # (EACCES/ENOSPC/EXDEV previously burned all retries and
            # raised a misleading lost-races error; in migrate() it
            # silently skipped CREATE):
            #  - ENOTEMPTY/EEXIST: contended DESTINATION — rename onto an
            #    existing non-empty v= dir; a peer committed first.
            #  - ENOENT on the SOURCE: a peer's _gc reaped our .staged-*
            #    dir because the stage-to-publish window exceeded
            #    _STAGED_ORPHAN_GRACE_S (long stall, or cross-node clock
            #    skew beyond the grace on a shared filesystem). Our
            #    staged data is gone, so treat it as a lost race and let
            #    the commit loop re-merge + re-stage (ADVICE r8; pre-r8
            #    behavior, now deliberate).
            shutil.rmtree(staged, ignore_errors=True)
            if e.errno in (errno.EEXIST, errno.ENOTEMPTY, errno.ENOENT):
                return False
            raise

    def _read_merge_commit(self, merge_fn) -> None:
        """Optimistic read-merge-publish loop: pin the base version, merge
        against that snapshot, publish as base+1; on a lost race re-merge
        against the winner's table. Bounded retries — contention on a
        metadata table is writer-count-bounded, so hitting the bound
        indicates a livelock bug, not load."""
        for _ in range(self._CAS_MAX_RETRIES):
            base = (self._versions() or [-1])[-1]
            merged = merge_fn(self._read_version(base))
            if merged is None:  # merge_fn declared the cycle a no-op
                return
            try:
                staged = self._stage(merged)
            except Exception as e:  # noqa: BLE001
                # the pinned v=base snapshot can be GC'd mid-merge when
                # enough other writers commit between pin and stage (the
                # Delta/Iceberg "expired snapshot" shape) — that is a
                # lost race, not an error; anything else propagates
                if "PATH_NOT_FOUND" in str(e) or "FileNotFound" in str(e):
                    continue
                raise
            if self._publish(staged, base + 1):
                self._gc(keep=3)
                return
        raise RuntimeError(
            f"ledger CAS commit lost {self._CAS_MAX_RETRIES} races at "
            f"{self.path!r}; concurrent writer storm or clock livelock"
        )

    # staged dirs older than this are crash orphans (a live writer's
    # staged dir exists for the seconds between stage and publish)
    _STAGED_ORPHAN_GRACE_S = 3600.0

    def _gc(self, keep: int) -> None:
        import shutil
        import time

        for v in self._versions()[:-keep]:
            shutil.rmtree(f"{self.path}/v={v}", ignore_errors=True)
        # reap .staged-* orphans from writers that crashed between stage
        # and publish — version GC never matched them, so they used to
        # accumulate on the shared ledger path forever
        now = time.time()
        for d in os.listdir(self.path):
            if not d.startswith(".staged-"):
                continue
            p = os.path.join(self.path, d)
            try:
                if now - os.path.getmtime(p) > self._STAGED_ORPHAN_GRACE_S:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # raced with its owner's publish/cleanup

    def upsert(self, new: DataFrame, key: list[str]) -> None:
        """Merge-on-key: drop old rows whose key appears in `new`, union
        the new rows (reference Runs.scala:93-102 ON DUPLICATE KEY UPDATE).
        Safe under concurrency twice over: the flock fast path serializes
        co-located writers, and the CAS publish beneath it rejects any
        commit built on a stale snapshot and re-merges — so the second
        writer merges onto the first's committed version instead of losing
        its rows (RunsTest.scala upsert semantics under concurrency; CAS
        path exercised lock-disabled in tests/test_ledger.py)."""
        with self.locked():
            self._read_merge_commit(
                lambda old: old.join(
                    new.select(*key).distinct(), key, "left_anti"
                ).unionByName(new)
            )

    def delete_where(self, cond) -> int:
        deleted = 0
        with self.locked():

            def merge(old: DataFrame) -> Optional[DataFrame]:
                nonlocal deleted
                deleted = old.filter(cond).count()
                # nothing matched on this snapshot: no version churn
                return old.filter(~cond) if deleted else None

            self._read_merge_commit(merge)
            return deleted


class RunsLedger:
    """The `runs` table: provenance of (input, version) -> output per
    (project, method, stage). Unique key: (project, method, stage, input,
    output) — reference runs.sql:11."""

    KEY = ["project", "method", "stage", "input", "output"]

    def __init__(self, spark: SparkSession, path: str, project: str, method: str):
        self.table = _VersionedTable(spark, path, RUNS_SCHEMA)
        self.spark = spark
        self.project = project
        self.method = method

    def migrate(self) -> None:
        self.table.migrate()

    def drop(self) -> None:
        self.table.drop()

    def all(self) -> list:
        return self.table.read().collect()

    def insert(
        self,
        stage: str,
        output: str,
        inputs: list[Input],
        now: Optional[datetime] = None,
    ) -> None:
        """Upsert one row per input (reference Runs.scala:77-103): same key
        -> version and timestamp replaced."""
        self.insert_many(stage, {output: list(inputs)}, now)

    def insert_many(
        self,
        stage: str,
        outputs_map: dict[str, list[Input]],
        now: Optional[datetime] = None,
    ) -> None:
        """Batched upsert covering every output of a run in ONE versioned
        write — a run with k outputs would otherwise pay k full-table
        rewrites (each a Spark job) for pure metadata."""
        ts = now or utc_now()
        rows = [
            (self.project, self.method, stage, i.key, i.version, output, ts)
            for output in sorted(outputs_map)
            for i in sorted(outputs_map[output], key=lambda x: x.key)
        ]
        if not rows:
            return
        new = self.spark.createDataFrame(rows, RUNS_SCHEMA)
        self.table.upsert(new, self.KEY)

    def of(self, stage: str) -> DataFrame:
        """All ledger rows for this (project, method, stage)
        (reference Runs.scala:106-116)."""
        return self.table.read().filter(
            (F.col("project") == self.project)
            & (F.col("method") == self.method)
            & (F.col("stage") == stage)
        )

    def delete(self, stage: str, output: str) -> int:
        return self.table.delete_where(
            (F.col("project") == self.project)
            & (F.col("method") == self.method)
            & (F.col("stage") == stage)
            & (F.col("output") == output)
        )


class RunStatusLedger:
    """The `runstatus` table: per-output lifecycle. Unique key: (project,
    method, stage, output) — reference runstatus.sql:11. Re-insert of an
    existing key RESETS started/ended (RunStatus.scala:79-83)."""

    KEY = ["project", "method", "stage", "output"]

    def __init__(self, spark: SparkSession, path: str, project: str, method: str):
        self.table = _VersionedTable(spark, path, RUNSTATUS_SCHEMA)
        self.spark = spark
        self.project = project
        self.method = method

    def migrate(self) -> None:
        self.table.migrate()

    def drop(self) -> None:
        self.table.drop()

    def all(self) -> list:
        return self.table.read().collect()

    def insert(self, stage: str, output: str, now: Optional[datetime] = None) -> None:
        self.insert_many(stage, [output], now)

    def insert_many(
        self, stage: str, outputs: list[str], now: Optional[datetime] = None
    ) -> None:
        """Batched insert: one upsert (one versioned write) for all outputs
        of a run; re-inserted keys still reset started/ended to NULL
        (RunStatus.scala:79-83)."""
        ts = now or utc_now()
        rows = [
            (self.project, self.method, stage, o, None, None, ts)
            for o in sorted(outputs)
        ]
        if not rows:
            return
        new = self.spark.createDataFrame(rows, RUNSTATUS_SCHEMA)
        self.table.upsert(new, self.KEY)

    def _set_many(
        self, stage: str, outputs: list[str], col: str, ts: datetime
    ) -> None:
        if not outputs:
            return
        k = (
            (F.col("project") == self.project)
            & (F.col("method") == self.method)
            & (F.col("stage") == stage)
            & (F.col("output").isin(list(outputs)))
        )
        with self.table.locked():
            self.table._read_merge_commit(
                lambda cur: cur.withColumn(
                    col, F.when(k, F.lit(ts)).otherwise(F.col(col))
                )
            )

    def start(self, stage: str, output: str, now: Optional[datetime] = None) -> None:
        self._set_many(stage, [output], "started", now or utc_now())

    def start_many(
        self, stage: str, outputs: list[str], now: Optional[datetime] = None
    ) -> None:
        self._set_many(stage, list(outputs), "started", now or utc_now())

    def end(self, stage: str, output: str, now: Optional[datetime] = None) -> None:
        self._set_many(stage, [output], "ended", now or utc_now())

    def end_many(
        self, stage: str, outputs: list[str], now: Optional[datetime] = None
    ) -> None:
        self._set_many(stage, list(outputs), "ended", now or utc_now())

    def of(self, stage: str) -> DataFrame:
        return self.table.read().filter(
            (F.col("project") == self.project)
            & (F.col("method") == self.method)
            & (F.col("stage") == stage)
        )

    def delete(self, stage: str, output: str) -> int:
        return self.table.delete_where(
            (F.col("project") == self.project)
            & (F.col("method") == self.method)
            & (F.col("stage") == stage)
            & (F.col("output") == output)
        )
