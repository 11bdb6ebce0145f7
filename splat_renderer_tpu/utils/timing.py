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
    """Mean wall-clock seconds per call of jitted `fn(*args)` (device-synced).

    Returns (seconds, last_result).

    CAVEAT (measured, v5e over the axon relay): every jitted execution
    carries ~1.5-2.8 ms of fixed launch overhead that does NOT amortize
    across the dispatch burst — a trivial (8,128) add measures ~2.5 ms/call.
    Numbers from this harness are therefore upper bounds with a ~2.5 ms
    additive offset; treat sub-2 ms differences between variants as noise,
    or loop the work inside one jitted program (lax.scan) to amortize."""
    def sync(x):
        # On relay transports (axon) block_until_ready can return before the
        # device work completes; a device->host fetch is the true barrier.
        # Fetch a single derived element (4 bytes) so the barrier cost is one
        # round trip, not a bulk transfer.  Device execution is a single
        # stream, so syncing once after a burst of dispatches bounds the sum
        # of their run times.
        leaf = jax.tree.leaves(x)[0]
        jax.device_get(leaf.ravel()[:1])
        return x

    out = None
    for _ in range(warmup):
        out = sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    total = time.perf_counter() - t0
    return total / iters, out


def time_fn_best(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 5,
    bursts: int = 3,
) -> Tuple[float, object]:
    """Minimum burst-mean across `bursts` independent time_fn bursts.

    Relay transport noise is strictly ADDITIVE — a hiccup only ever slows a
    burst down, never speeds it up — and run-to-run weather on identical
    code spans multiple ms (measured turbo frame: 25.3 / 27.4 / 34.7 ms
    across three runs, NOTES.md round 3).  The minimum burst mean is
    therefore the least weather-contaminated estimate of sustained per-call
    time.  Use this for scoreboard numbers (bench.py headline metrics);
    single bursts remain fine for in-process A/B deltas, where both
    variants see the same weather."""
    best, out = time_fn(fn, *args, warmup=warmup, iters=iters)
    for _ in range(bursts - 1):
        t, out = time_fn(fn, *args, warmup=0, iters=iters)
        best = min(best, t)
    return best, out


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
