"""Does the relay's fixed dispatch cost scale with the ARGUMENT/RESULT
buffer count?  probe_project_r5 found every P1 sub-stage — including one
with the entire radius loop removed — costs the same ~3.2 ms over the
trivial-add dispatch floor, pointing at a per-buffer overhead rather
than device compute.

Variants (all trivial compute):
  a1:  one (N,) input -> one output            [the dispatch baseline @1M]
  a11: 11-plane dict input -> one output       [the splat-dict shape]
  a11o5: 11-plane dict in -> 5-plane dict out  [the words-path shape]
  apk: one (11, N) array in -> one output      [packed alternative]
  a11s: 11 SMALL (8,) planes -> one output     [arg count, no bytes]

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_dispatch_r5.py
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000


def main() -> None:
    k = jax.random.PRNGKey(0)
    one = jax.random.uniform(k, (N,), jnp.float32)
    planes = {f"p{i}": jax.random.uniform(jax.random.fold_in(k, i), (N,),
                                          jnp.float32) for i in range(11)}
    packed = jnp.stack(list(planes.values()))  # (11, N)
    small = {f"s{i}": jnp.ones((8,), jnp.float32) for i in range(11)}

    def a1(x):
        return x + 1.0

    def a11(d):
        s = d["p0"]
        for i in range(1, 11):
            s = s + d[f"p{i}"]
        return s

    def a11o5(d):
        s = a11(d)
        return {f"o{i}": s + float(i) for i in range(5)}

    def apk(m):
        return m.sum(axis=0)

    def a11s(d):
        s = d["s0"]
        for i in range(1, 11):
            s = s + d[f"s{i}"]
        return s

    variants = [("a1", a1, (one,)), ("a11", a11, (planes,)),
                ("a11o5", a11o5, (planes,)), ("apk", apk, (packed,)),
                ("a11s", a11s, (small,))]
    fns = []
    for name, f, args in variants:
        jf = jax.jit(f)
        jax.device_get(jax.tree.leaves(jf(*args))[0].ravel()[:1])
        print(f"compiled {name}", file=sys.stderr)
        fns.append((name, jf, args))

    results = {name: [] for name, _, _ in fns}
    for burst in range(5):
        for name, jf, args in fns:
            t, _ = time_fn(jf, *args, warmup=1, iters=10)
            results[name].append(t * 1e3)
    for name, ts in results.items():
        print(f"{name}: bursts {['%.3f' % t for t in ts]}  "
              f"min {min(ts):.3f} ms")


if __name__ == "__main__":
    main()
