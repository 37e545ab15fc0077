"""Tracing / profiling utilities (SURVEY section 5: absent in the reference —
only commented-out timing at sunrgbd/brnetcanon.py:98-100).

Provides per-phase wall timing with device synchronization plus optional
jax.profiler traces (Perfetto/XProf) around any phase.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


class PhaseTimer:
    """Accumulates wall time per named phase; ``sync=True`` blocks on the
    device so timings are real (async dispatch otherwise lies)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1000 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in sorted(self.totals)
        }

    def log(self):
        for name, row in self.summary().items():
            logger.info("phase %-20s %6.1f ms x %d", name, row["mean_ms"],
                        row["count"])

    def dump_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace (view in XProf/Perfetto); no-op when logdir=None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
