"""Is bf16 elementwise VPU math 2x f32 on this chip?  Decides whether a bf16
fast profile for the blend kernel's alpha panels is worth building.

One Pallas kernel per dtype: a chain of K elementwise ops on a (128, 256)
panel, repeated R times per grid step to swamp step overhead.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_bf16.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from splat_renderer_tpu.utils.timing import time_fn

R = 256  # op-chain repeats per grid step
STEPS = 512


def make(dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[...].astype(dtype)
        half = jnp.asarray(0.5, dtype)
        one = jnp.asarray(1.0, dtype)
        acc = x
        for _ in range(R):
            acc = acc * half + one  # fused multiply-add chain
        o_ref[...] = acc.astype(jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((128, 256), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((128, 256), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        )(x)

    return run


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), (128, 256), jnp.float32)
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        t, _ = time_fn(make(dt), x, warmup=2, iters=10)
        ops = R * STEPS * 128 * 256
        print(f"{name}: {t*1e3:7.3f} ms   ({ops/t/1e12:.2f} Tfma/s)")


if __name__ == "__main__":
    main()
