"""Probe: pair-sort variants at the bench shape (4M pairs, 8160 tiles).

Round-2 finding: XLA variadic sort cost is dominated by the NUMBER OF KEY
columns, not total columns (4col nk2 = 13.2 ms vs 4col nk4 = 19.5 ms at 4M).
So the win is a single fused u32 key: pre-sort the N records by depth (cheap
at 1M), give each record its sorted ROW INDEX as a unique rank, and pair-sort
by (tile13 | rank_hi19) with a 1-pass neighbor fixup for the coarsened rank
bit.  Canonical compositing order becomes (depth_bits, input index) — the
reference's submission-order semantics (src/RadixSorter.ts payload order).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_sort_variants.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splat_renderer_tpu.utils.timing import time_fn

P = 4_000_000
N = 1_000_000
T = 8160


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    tile = jax.random.randint(ks[0], (P,), 0, T + 1, jnp.int32)
    dkey = jax.random.bits(ks[1], (P,), jnp.uint32)
    w0 = jax.random.bits(ks[2], (P,), jnp.uint32)
    w1 = jax.random.bits(ks[3], (P,), jnp.uint32)
    w2 = jax.random.bits(ks[4], (P,), jnp.uint32)
    rank = jax.random.bits(ks[5], (P,), jnp.uint32) >> 12
    fused = (tile.astype(jnp.uint32) << 19) | (rank >> 1)

    rk = jax.random.bits(ks[6], (N,), jnp.uint32)
    r0, r1, r2, r3 = (jax.random.bits(k, (N,), jnp.uint32)
                      for k in jax.random.split(ks[7], 4))

    def sA(t, d, a, b, c):  # production: 5col nk5
        return jax.lax.sort((t, d, a, b, c), num_keys=5, is_stable=False)[0]

    def sP1(f, a, b):  # fused-key exact pair sort: 3col nk1
        return jax.lax.sort((f, a, b), num_keys=1, is_stable=False)[0]

    def sP2(t, r, a, b):  # nk2 fallback (N > 2M or general profile)
        return jax.lax.sort((t, r, a, b), num_keys=2, is_stable=False)[0]

    def sP3(t, r, a, b, c):  # general 3-word profile: 5col nk2
        return jax.lax.sort((t, r, a, b, c), num_keys=2, is_stable=False)[0]

    def sR(d, a, b, c, e):  # record depth sort @1M: stable nk1, 4 payloads
        return jax.lax.sort((d, a, b, c, e), num_keys=1, is_stable=True)[0]

    def fixup(f, a, b):  # 1-pass neighbor compare-exchange on rank_lo
        eq = f[:-1] == f[1:]
        lo_l, lo_r = a[:-1] & 3, a[1:] & 3
        sw = eq & (lo_l > lo_r)
        swl = jnp.concatenate([jnp.zeros((1,), bool), sw])
        swr = jnp.concatenate([sw, jnp.zeros((1,), bool)])

        def ex(x):
            right = jnp.concatenate([x[1:], x[-1:]])
            left = jnp.concatenate([x[:1], x[:-1]])
            return jnp.where(swr, right, jnp.where(swl, left, x))

        return ex(a), ex(b)

    tA, _ = time_fn(jax.jit(sA), tile, dkey, w0, w1, w2, warmup=2, iters=5)
    tP1, _ = time_fn(jax.jit(sP1), fused, w0, w1, warmup=2, iters=5)
    tP2, _ = time_fn(jax.jit(sP2), tile, rank, w0, w1, warmup=2, iters=5)
    tP3, _ = time_fn(jax.jit(sP3), tile, rank, w0, w1, w2, warmup=2, iters=5)
    tR, _ = time_fn(jax.jit(sR), rk, r0, r1, r2, r3, warmup=2, iters=5)
    tF, _ = time_fn(jax.jit(fixup), fused, w0, w1, warmup=2, iters=5)
    print(f"A  5col nk5 @4M (production)       : {tA*1e3:8.3f} ms")
    print(f"P1 3col nk1 @4M (fused exact)      : {tP1*1e3:8.3f} ms")
    print(f"P2 4col nk2 @4M (rank fallback)    : {tP2*1e3:8.3f} ms")
    print(f"P3 5col nk2 @4M (3-word general)   : {tP3*1e3:8.3f} ms")
    print(f"R  stable nk1 + 4 payload @1M      : {tR*1e3:8.3f} ms")
    print(f"F  fixup pass @4M x 2 cols         : {tF*1e3:8.3f} ms")
    print(f"-> new exact isotropic bin sorts: R + P1 + F = "
          f"{(tR + tP1 + tF)*1e3:8.3f} ms (vs A {tA*1e3:.3f})")


if __name__ == "__main__":
    main()
