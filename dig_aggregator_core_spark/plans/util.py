"""Small run-observability helpers (reference Util.scala).

The reference wraps each stage execution in ``Util.time`` (Util.scala:9-21,
used from Method.scala:105): run the body, then log ``"<msg> took <N> ms"``
in a finally block so the elapsed time is recorded even when the body
throws. ``time_block`` is the context-manager form of the same contract.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from typing import Callable, Iterator, Optional

logger = logging.getLogger(__name__)


@contextmanager
def time_block(
    msg: str, do_log: Optional[Callable[[str], None]] = None
) -> Iterator[None]:
    """Log ``"<msg> took <N> ms"`` when the block exits (even on error).

    ``do_log`` defaults to this module's logger at INFO, mirroring the
    reference's default-`println` parameter (Util.scala:9).
    """
    log = do_log or (lambda s: logger.info("%s", s))
    start = time.monotonic()
    try:
        yield
    finally:
        elapsed_ms = int((time.monotonic() - start) * 1000)
        log(f"{msg} took {elapsed_ms} ms")
