"""Profiling helpers (SURVEY.md §5.1: the reference has no instrumentation).

- :class:`StepTimer` — wall-clock phase timers with device synchronisation
  (block_until_ready) so numbers mean what they say;
- :func:`trace` — context manager around ``jax.profiler.trace`` for
  TensorBoard-compatible device traces;
- :func:`throughput` — particle-steps/sec bookkeeping, the BASELINE metric.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StepTimer:
    """Accumulating named phase timer.

    >>> t = StepTimer()
    >>> with t("step"):
    ...     state = solver.step(state)   # block happens on context exit
    >>> t.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._last_result = None

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def report(self) -> str:
        lines = []
        for k, v in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{k:24s} {v['mean_ms']:9.2f} ms/call x{v['count']}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace for TensorBoard / xprof (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(num_particles: int, num_steps: int, wall_seconds: float) -> dict[str, float]:
    """The BASELINE metric: particle-steps/sec + wall-clock per sim-second."""
    pps = num_particles * num_steps / wall_seconds
    return {
        "particle_steps_per_sec": pps,
        "steps_per_sec": num_steps / wall_seconds,
        "wall_seconds": wall_seconds,
    }
