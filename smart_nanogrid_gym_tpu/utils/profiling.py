"""Tracing/profiling helpers.

The reference's only observability is wall-clock prints around training
(solvers/RL/ppo_train.py:99-112).  Here: ``jax.profiler`` trace capture around
any callable, simple phase timers, and a steps/s meter used by the benchmark
harness and training scripts.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device results."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


class ThroughputMeter:
    """env-steps/s over a sliding window of record() calls."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def record(self, n_steps: int):
        if self.t0 is None:
            self.start()
        self.steps += n_steps

    @property
    def steps_per_sec(self) -> float:
        if self.t0 is None or self.steps == 0:
            return 0.0
        return self.steps / (time.perf_counter() - self.t0)
