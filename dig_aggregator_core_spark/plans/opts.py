"""Run options (reference Opts.scala:9-79): execution-mode flags plus the
only/exclude output-name glob filters. Mirrors the reference's validation:
--insert-runs and --no-insert-runs are mutually exclusive, --clusters > 0."""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Optional

from ..functions.glob import Glob


@dataclass
class Opts:
    stage: Optional[str] = None
    reprocess: bool = False
    yes: bool = False
    test: bool = False
    only: Optional[str] = None
    exclude: Optional[str] = None
    show_inputs: bool = False
    insert_runs: bool = False
    no_insert_runs: bool = False
    max_clusters: int = 5

    def __post_init__(self) -> None:
        if self.insert_runs and self.no_insert_runs:
            raise ValueError(
                "--insert-runs and --no-insert-runs are mutually exclusive"
            )
        if self.max_clusters <= 0:
            raise ValueError("--clusters must be > 0")

    @property
    def dry_run(self) -> bool:
        return not self.yes

    @staticmethod
    def _globs(spec: Optional[str]) -> Optional[list[Glob]]:
        """Comma-separated glob list (Opts.scala:72-79)."""
        if spec is None:
            return None
        return [Glob(s) for s in spec.split(",") if s]

    @property
    def only_globs(self) -> Optional[list[Glob]]:
        return self._globs(self.only)

    @property
    def exclude_globs(self) -> Optional[list[Glob]]:
        return self._globs(self.exclude)

    @staticmethod
    def parse(args: list[str]) -> "Opts":
        p = argparse.ArgumentParser(prog="method")
        p.add_argument("--stage")
        p.add_argument("--reprocess", action="store_true")
        p.add_argument("--yes", action="store_true")
        p.add_argument("--test", action="store_true")
        p.add_argument("--only")
        p.add_argument("--exclude")
        p.add_argument("--show-inputs", action="store_true")
        g = p.add_mutually_exclusive_group()
        g.add_argument("--insert-runs", action="store_true")
        g.add_argument("--no-insert-runs", action="store_true")
        p.add_argument("--clusters", type=int, default=5)
        ns = p.parse_args(args)
        return Opts(
            stage=ns.stage,
            reprocess=ns.reprocess,
            yes=ns.yes,
            test=ns.test,
            only=ns.only,
            exclude=ns.exclude,
            show_inputs=ns.show_inputs,
            insert_runs=ns.insert_runs,
            no_insert_runs=ns.no_insert_runs,
            max_clusters=ns.clusters,
        )
