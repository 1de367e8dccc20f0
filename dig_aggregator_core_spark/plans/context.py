"""Execution context: binds the Spark session, project name, ledgers, and
the object lister (reference Context/Method.scala:109-117 — minus AWS: the
ledger is Parquet, jobs run in-process on the session)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Callable, Optional

from pyspark.sql import SparkSession

from .ledger import RunsLedger, RunStatusLedger

# a lister maps a key prefix -> [(key, version)] — the S3 LIST equivalent
Lister = Callable[[str], list[tuple[str, datetime]]]


def local_lister(root: str) -> Lister:
    """List files under a local root directory as key/mtime pairs —
    the local stand-in for the S3 listing boundary (Input.scala:38-45)."""

    def ls(prefix: str) -> list[tuple[str, datetime]]:
        out = []
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                full = os.path.join(dirpath, f)
                key = os.path.relpath(full, root).replace(os.sep, "/")
                if key.startswith(prefix):
                    mtime = datetime.fromtimestamp(
                        os.path.getmtime(full), tz=timezone.utc
                    ).replace(tzinfo=None)
                    # millisecond granularity, matching Hadoop's
                    # getModificationTime, so swapping this lister for
                    # sources.object_store.hadoop_lister on an existing
                    # warehouse cannot shift Input versions (ADVICE
                    # r10); truncation only LOWERS listed versions, and
                    # freshness is strict >, so no spurious re-runs
                    mtime = mtime.replace(
                        microsecond=mtime.microsecond // 1000 * 1000
                    )
                    out.append((key, mtime))
        return sorted(out)

    return ls


@dataclass
class Context:
    spark: SparkSession
    project: str
    method_name: str
    warehouse: str  # directory holding the ledgers (+ default output root)
    lister: Lister

    _runs: Optional[RunsLedger] = field(default=None, repr=False)
    _status: Optional[RunStatusLedger] = field(default=None, repr=False)

    @property
    def runs(self) -> RunsLedger:
        if self._runs is None:
            self._runs = RunsLedger(
                self.spark, f"{self.warehouse}/runs", self.project, self.method_name
            )
        return self._runs

    @property
    def runstatus(self) -> RunStatusLedger:
        if self._status is None:
            self._status = RunStatusLedger(
                self.spark,
                f"{self.warehouse}/runstatus",
                self.project,
                self.method_name,
            )
        return self._status
