"""Tracing / profiling utilities.

The reference's observability is wall-clock prints and tqdm bars (SURVEY.md
§5: smooth.py:64-97, gptq.py:76,176-177).  Here: structured stage timers that
aggregate into a report, plus a ``jax.profiler`` trace context for on-device
timelines (viewable in TensorBoard / Perfetto).

Note: on the tunneled runtime, host wall-clock around dispatches measures RPC
enqueue only (CLAUDE.md) — ``stage`` fences with ``block_until_ready`` on an
optional result, and device-accurate numbers come from ``device_trace``.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

import jax

logger = logging.getLogger("qqq_tpu")


class StageTimer:
    """Accumulates named stage durations (calibration pipeline spans)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.time()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.debug("stage %s: %.3fs", name, dt)

    def report(self) -> str:
        lines = ["stage timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name:<30s} {self.totals[name]:8.2f}s"
                f"  x{self.counts[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/qqq_tpu_trace"):
    """jax.profiler trace context — device timeline for kernel analysis."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)
