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

    CAVEAT (re-measured round 5, v5e over the axon relay): the transport's
    fixed cost is ~26 ms PER BURST (the device_get barrier round trip),
    NOT per dispatch — a trivial (8,128) add's burst total is ~26-28 ms at
    ANY iters from 1 to 80 (~0.1 ms/dispatch marginal).  Round 2's
    "~2.5 ms per dispatch, does not amortize" was this same barrier seen
    through a single iters=10/20 lens.  Consequences: numbers from this
    harness carry a ~26/iters ms additive offset; same-iters A/B deltas
    are still clean (both sides carry it); for ABSOLUTE sustained rates
    use time_fn_sustained, whose two-burst-length marginal cancels the
    barrier entirely."""
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


def time_fn_sustained(
    fn: Callable,
    *args,
    iters_short: int = 5,
    iters_long: int = 20,
    bursts: int = 3,
    warmup: int = 2,
) -> Tuple[float, object]:
    """Sustained per-call seconds: the MARGINAL cost of an extra call in a
    burst, which cancels the relay's ~26 ms per-burst barrier exactly.

    For each round, time one short and one long burst and take
      (total_long - total_short) / (iters_long - iters_short);
    the per-burst fixed cost subtracts out, leaving device time + the
    ~0.1 ms true per-dispatch cost — the per-frame cost of a deployment
    loop that renders continuously (the reference's rAF loop measures FPS
    the same way: no per-frame host sync).  Min over `bursts` rounds
    (relay weather is additive).  Discovered round 5: the round-2 claim
    that dispatch overhead "does not amortize" conflated the barrier with
    the dispatch — a trivial add's burst TOTAL is flat in iters (26-28 ms
    from iters=1 to 80), so burst-mean estimators overstate every frame
    by ~26/iters ms (at iters=5: +5.2 ms on the headline)."""
    out = None
    best_short = best_long = float("inf")
    for b in range(bursts):
        ts, out = time_fn(fn, *args, warmup=warmup if b == 0 else 0,
                          iters=iters_short)
        tl, out = time_fn(fn, *args, warmup=0, iters=iters_long)
        best_short = min(best_short, ts * iters_short)
        best_long = min(best_long, tl * iters_long)
    # min the burst TOTALS first, then difference: weather is additive, so
    # each min converges to the true total independently; differencing raw
    # per-round marginals instead lets a spike in one SHORT burst produce
    # a deflated (even negative) marginal that min() then keeps.  A
    # non-positive result here means the quantity is below this method's
    # floor — the caller must mark it, never publish 0.0.
    marginal = (best_long - best_short) / (iters_long - iters_short)
    return max(marginal, 0.0), out


def relay_cost_model() -> Dict[str, float]:
    """Measure the transport's fixed costs: per-BURST barrier and per-
    dispatch marginal, from a trivial program at two burst lengths.
    Returns {"barrier_ms", "per_dispatch_ms"}."""
    import jax.numpy as jnp

    triv = jax.jit(lambda v: v + 1.0)
    x = jnp.ones((8, 128), jnp.float32)
    jax.device_get(triv(x).ravel()[:1])
    # 5 rounds: a single stalled round inflated one capture's barrier to
    # 138 ms (true ~26-28) — weather is additive, min is the estimator
    t5 = min(time_fn(triv, x, warmup=0, iters=5)[0] for _ in range(5))
    t40 = min(time_fn(triv, x, warmup=0, iters=40)[0] for _ in range(5))
    d = max((t40 * 40 - t5 * 5) / 35.0, 0.0)
    b = max(t5 * 5 - 5 * d, 0.0)
    return {"barrier_ms": b * 1e3, "per_dispatch_ms": d * 1e3}


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
