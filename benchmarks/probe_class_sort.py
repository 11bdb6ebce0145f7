"""Probe: class-partitioned pair expansion — does shrinking the pair sort pay?

The pair sort runs over P = N * cap SLOTS (4M at the 1M/cap-4 bench shape)
but only ~1.7M pairs are real (avg footprint ~1.7 tiles after the ellipse
AABB + diagonal prune).  Partitioning the RECORDS by footprint class
(w*h > 2 -> cap slots, == 2 -> 2 slots, <= 1 -> 1 slot) with one extra
N-scale fused-key sort lets the expansion allocate per-class capacities:

  P_class = cap*C4 + 2*C2 + 1*C1  ~  N + 3*C4 + C2  ~  2.1M  (vs 4M)

This probe measures both sides of the trade on the real chip:
  - the added class sort at N (1 fused u32 key = class:2|rank:20|r:10,
    payloads w_pos, w_rgb [, meta])
  - the pair sort nk2 (tile, rank) + 2 payloads at P in {4M, 2.6M, 2.1M}

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_class_sort.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
T = 8160


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    def pair_cols(p, k):
        k0, k1, k2, k3 = jax.random.split(k, 4)
        tile = jax.random.randint(k0, (p,), 0, T + 1, jnp.int32)
        rank = jax.random.bits(k1, (p,), jnp.uint32) >> 12
        wa = jax.random.bits(k2, (p,), jnp.uint32)
        wb = jax.random.bits(k3, (p,), jnp.uint32)
        return tile, rank, wa, wb

    def s_pair(t, r, a, b):
        return jax.lax.sort((t, r, a, b), num_keys=2, is_stable=False)[0]

    # class sort: fused u32 key, 3 payloads
    ck = jax.random.bits(ks[4], (N,), jnp.uint32)
    c0, c1, c2 = (jax.random.bits(k, (N,), jnp.uint32)
                  for k in jax.random.split(ks[5], 3))

    def s_class3(f, a, b, c):
        return jax.lax.sort((f, a, b, c), num_keys=1, is_stable=False)[0]

    def s_class2(f, a, b):
        return jax.lax.sort((f, a, b), num_keys=1, is_stable=False)[0]

    for p, tag in ((4_000_000, "4.0M (cap-4 now)"),
                   (2_600_000, "2.6M"),
                   (2_100_000, "2.1M (class est)"),
                   (1_750_000, "1.75M (ideal)")):
        cols = pair_cols(p, ks[0])
        t, _ = time_fn(jax.jit(s_pair), *cols, warmup=2, iters=5)
        print(f"pair nk2+2pay @{tag:18s}: {t*1e3:8.3f} ms")

    t3, _ = time_fn(jax.jit(s_class3), ck, c0, c1, c2, warmup=2, iters=5)
    t2, _ = time_fn(jax.jit(s_class2), ck, c0, c1, warmup=2, iters=5)
    print(f"class nk1+3pay @1M              : {t3*1e3:8.3f} ms")
    print(f"class nk1+2pay @1M              : {t2*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
