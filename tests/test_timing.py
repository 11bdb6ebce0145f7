"""utils/timing harness tests (CPU).

The scoreboard (bench.py) depends on time_fn_best's min-of-bursts semantics:
relay transport noise is strictly additive, so the minimum burst mean is the
least weather-contaminated sustained-rate estimate (utils/timing.py).
"""

import jax
import jax.numpy as jnp

from splat_renderer_tpu.utils.timing import (
    relay_cost_model,
    time_fn,
    time_fn_best,
    time_fn_sustained,
)


def test_time_fn_returns_positive_time_and_result():
    f = jax.jit(lambda x: x * 2.0)
    t, out = time_fn(f, jnp.ones((8, 128)), warmup=1, iters=3)
    assert t > 0.0
    assert out.shape == (8, 128)
    assert float(out[0, 0]) == 2.0


def test_time_fn_best_is_min_of_bursts():
    # instrument: each call records one timestamp; time_fn_best must run
    # warmup + bursts * iters calls and return the smallest burst mean
    calls = []

    def f(x):
        import time

        calls.append(time.perf_counter())
        return x

    t_best, out = time_fn_best(f, jnp.ones((4, 4)), warmup=2, iters=3, bursts=4)
    assert len(calls) == 2 + 4 * 3
    assert t_best > 0.0
    # the min can never exceed a single fresh burst's mean by construction:
    # re-run one burst and check the best is within the plausible band
    t_single, _ = time_fn(f, jnp.ones((4, 4)), warmup=0, iters=3)
    assert t_best <= t_single * 50  # sanity only — timing, not a perf gate


def test_time_fn_best_single_burst_matches_time_fn_shape():
    f = jax.jit(lambda x: x + 1.0)
    t, out = time_fn_best(f, jnp.zeros((8, 128)), warmup=1, iters=2, bursts=1)
    assert t > 0.0
    assert float(out[0, 0]) == 1.0


def test_time_fn_sustained_cancels_per_burst_fixed_cost():
    """The marginal estimator must remove a cost paid once per burst: a
    callable with a large fixed FIRST-call-of-burst delay (simulating the
    relay's ~26 ms barrier showing up in the burst total) and a small
    per-call cost should measure close to the per-call cost, while the
    burst-mean estimator reports per-call + fixed/iters."""
    import time

    state = {"calls": 0}
    per_call = 2e-3

    def f(x):
        time.sleep(per_call)
        state["calls"] += 1
        return x

    # monkey-model: wrap time_fn's burst with an extra fixed sleep by
    # giving the function itself a periodic cost is fragile; instead rely
    # on the algebra — measure at two iters and check the marginal lands
    # near per_call even when we add a fixed cost to both burst totals
    ts, _ = time_fn(f, jnp.ones((2,)), warmup=0, iters=4)
    tl, _ = time_fn(f, jnp.ones((2,)), warmup=0, iters=16)
    fixed = 30e-3
    ts_with = ts + fixed / 4
    tl_with = tl + fixed / 16
    marginal_with = (tl_with * 16 - ts_with * 4) / 12
    marginal_plain = (tl * 16 - ts * 4) / 12
    # the fixed per-burst cost cancels EXACTLY in the marginal...
    assert abs(marginal_with - marginal_plain) < 1e-9
    # ...while the burst-mean estimator keeps fixed/iters of it (loose
    # band: sleep-timer noise rides on the real ts/tl measurements)
    assert ts_with - marginal_with > fixed / 16

    t_sus, out = time_fn_sustained(f, jnp.ones((2,)), iters_short=2,
                                   iters_long=6, bursts=2, warmup=1)
    assert t_sus >= 0.0
    assert out.shape == (2,)


def test_relay_cost_model_shape():
    cm = relay_cost_model()
    assert set(cm) == {"barrier_ms", "per_dispatch_ms"}
    assert cm["barrier_ms"] >= 0.0 and cm["per_dispatch_ms"] >= 0.0
