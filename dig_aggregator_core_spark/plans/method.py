"""Method: an ordered pipeline of stages (reference Method.scala:14-143).

Stages run sequentially in authoring order; `--stage` narrows to one (a
miss raises KeyError, like the reference's NoSuchElementException);
`show_work` short-circuits at the first stage with work (Method.scala:62).
The stdin reprocess-confirmation gate is injectable for tests."""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

from .context import Context
from .opts import Opts
from .stage import Stage
from .util import time_block

logger = logging.getLogger(__name__)


class Method:
    def __init__(self) -> None:
        self.stages: list[Stage] = []

    @property
    def name(self) -> str:
        return type(self).__name__

    def add_stage(self, stage: Stage) -> None:
        self.stages.append(stage)

    def init_stages(self, context: Context) -> None:
        raise NotImplementedError

    def get_stage(self, name: str) -> Stage:
        for s in self.stages:
            if s.name == name:
                return s
        raise KeyError(name)

    def filter_stages(self, opts: Opts) -> list[Stage]:
        if opts.stage is None:
            return list(self.stages)
        matched = [s for s in self.stages if s.name == opts.stage]
        if not matched:
            raise KeyError(opts.stage)
        return matched

    def show_work(self, opts: Opts) -> None:
        stages = self.filter_stages(opts)
        if not stages:
            logger.warning("no stage(s) found in %s", self.name)
            return
        any(s.show_work(opts) for s in stages)  # short-circuits at first hit

    def _run(self, opts: Opts) -> None:
        # per-stage wall-clock, logged even when a stage throws
        # (reference Util.time wrapping stage runs, Method.scala:105)
        for stage in self.filter_stages(opts):
            with time_block(f"stage {stage.name}"):
                stage.run(opts)

    @staticmethod
    def _confirm_reprocess() -> bool:
        """Default --reprocess gate: stdin [y/N] prompt, mirroring the
        reference's confirmReprocess (Method.scala:78-96) so reprocessing
        everything is never a silent default."""
        try:
            answer = input(
                "really reprocess all inputs as if never processed? [y/N]: "
            )
        except EOFError:
            return False
        return answer.strip().lower() in ("y", "yes")

    def main(
        self,
        args: list[str],
        context: Context,
        confirm: Optional[Callable[[], bool]] = None,
    ) -> None:
        """The CLI entry (Method.scala:104-143): parse opts, migrate the
        ledgers, gate --reprocess+--yes behind confirmation (a real stdin
        prompt by default; `confirm` injection is a test override), then
        run or just show work."""
        t0 = time.monotonic()
        opts = Opts.parse(args)
        self.init_stages(context)
        context.runs.migrate()
        context.runstatus.migrate()

        proceed = True
        if opts.yes and opts.reprocess:
            gate = confirm if confirm is not None else self._confirm_reprocess
            proceed = gate()
        if proceed:
            if opts.dry_run:
                logger.warning("dry run; no outputs will be built")
            if opts.yes:
                self._run(opts)
            else:
                self.show_work(opts)
        logger.info(
            "method %s finished in %.1fs", self.name, time.monotonic() - t0
        )
