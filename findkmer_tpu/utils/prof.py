"""Tracing/profiling helpers (SURVEY.md §5).

The reference has no timers at all; here:
  * `phase_timer` — wall-clock phase breakdown (encode / transfer / kernel /
    merge) with jax.block_until_ready bracketing, aggregated into a dict.
  * `device_trace` — jax.profiler trace context emitting
    TensorBoard/Perfetto traces for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimers:
    """Accumulates wall time per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        """Time a phase; block_on: optional jax value to block_until_ready
        before stopping the clock (device phases)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def as_dict(self) -> Dict[str, float]:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name]}
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler.trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
