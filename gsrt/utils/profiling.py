"""Tracing / profiling helpers (SURVEY.md §5 tracing row).

The reference exposes shader-clock heatmaps and simulator stat dumps; on
real TPUs the equivalents are XLA profiler traces plus host-side stage
timers with proper device sync (NB: `jax.block_until_ready` is unreliable
through the axon tunnel — sync by fetching a reduction).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


def device_sync(*arrays) -> None:
    """Robust device sync: fetch a tiny reduction of each array."""
    for a in arrays:
        if hasattr(a, "dtype"):
            float(jnp.sum(jnp.ravel(a)[:1]))


class StageTimer:
    """Accumulates wall-clock per named stage across frames."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, *sync_arrays):
        t0 = time.perf_counter()
        yield
        device_sync(*sync_arrays)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return {k: round(self.totals[k] / max(self.counts[k], 1) * 1e3, 2)
                for k in self.totals}


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
