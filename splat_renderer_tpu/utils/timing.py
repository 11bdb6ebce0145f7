"""Per-stage timing harness.

The reference has zero timing instrumentation (SURVEY.md section 5); its
plan docs asked for "performance monitoring for each GPU pass" and never built
it.  This provides the block_until_ready wall-clock harness the rebuild's
benchmarks use.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
) -> Tuple[float, object]:
    """Median wall-clock seconds per call of jitted `fn(*args)` (device-synced).

    Returns (seconds, last_result)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    # Amortize over iters with a block per call: some transport backends
    # (axon relay) complete block_until_ready one dispatch late, so per-call
    # medians under-report; the amortized mean is robust to that.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    total = time.perf_counter() - t0
    return total / iters, out


class StageTimer:
    """Collects named stage timings into a dict of milliseconds."""

    def __init__(self, warmup: int = 2, iters: int = 10):
        self.warmup = warmup
        self.iters = iters
        self.ms: Dict[str, float] = {}

    def stage(self, name: str, fn: Callable, *args):
        sec, out = time_fn(fn, *args, warmup=self.warmup, iters=self.iters)
        self.ms[name] = sec * 1e3
        return out
