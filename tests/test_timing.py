"""utils/timing harness tests (CPU).

The scoreboard (bench.py) depends on time_fn_best's min-of-bursts semantics:
relay transport noise is strictly additive, so the minimum burst mean is the
least weather-contaminated sustained-rate estimate (utils/timing.py).
"""

import jax
import jax.numpy as jnp

from splat_renderer_tpu.utils.timing import time_fn, time_fn_best


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
