"""Profiling / tracing hooks.

The reference has no profiler integration — only charts/SPS counters
(SURVEY.md §5).  Here tracing is first-class: a jax.profiler trace capture
around a training window (viewable in TensorBoard/Perfetto/XProf) and a
lightweight phase timer that logs per-phase wall-clock (rollout/update/eval)
as TensorBoard scalars.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "profiles") -> Iterator[None]:
    """Capture a device trace for the enclosed block.

        with profiling.trace("profiles/run1"):
            for _ in range(5):
                runner, _ = train_iteration(runner)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocking on device results is
    the caller's responsibility (pass a representative array to ``stop``)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._start: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def averages(self) -> Dict[str, float]:
        return {
            f"profile/{name}_ms": 1e3 * self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }

    def report(self, writer=None, step: Optional[int] = None) -> Dict[str, float]:
        avgs = self.averages()
        if writer is not None and step is not None:
            for tag, val in avgs.items():
                writer.scalar(tag, val, step)
        return avgs
