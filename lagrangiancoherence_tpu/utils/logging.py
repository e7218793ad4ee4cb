"""Stage-granular logging, mirroring the reference's ``verboseprint``
convention (/root/reference/LCS/LCS.py:72-75, trajectory.py:47) on top of the
standard :mod:`logging` machinery.

The reference gates bare ``print`` calls behind a ``verbose`` flag; here each
pipeline stage logs through the ``lagrangiancoherence_tpu`` logger, and the
``verbose=`` API flag simply toggles a stream handler at INFO level, so batch
drivers can silence or redirect stages without touching library code.
"""
from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager

LOGGER_NAME = "lagrangiancoherence_tpu"

logger = logging.getLogger(LOGGER_NAME)


def configure_verbosity(verbose: bool) -> None:
    """Attach (or detach) a stderr INFO handler, idempotently."""
    existing = [h for h in logger.handlers if getattr(h, "_lcs_default", False)]
    if verbose and not existing:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
        h._lcs_default = True
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    elif not verbose:
        for h in existing:
            logger.removeHandler(h)


def stage(msg: str) -> None:
    """Stage banner, same granularity as the reference's
    ``*---- Parcel propagation ----*`` prints (/root/reference/LCS/LCS.py:127,140,151,156)."""
    logger.info("*---- %s ----*", msg)


@contextmanager
def timed_stage(msg: str):
    """Stage banner plus wall-clock timing — the tracing hook the reference
    lacks (SURVEY.md §5)."""
    stage(msg)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s took %.3f s", msg, time.perf_counter() - t0)
