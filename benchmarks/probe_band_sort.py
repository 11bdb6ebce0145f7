"""Rank-banded pair-sort probe: B sorts of P/B slots with EXACT fused keys.

The exact (tile, rank) pair sort needs tile_bits + rank_bits = 33 bits at the
headline shape (1080p, 1M) — one over the fused-u32 limit, forcing num_keys=2
(12.0 ms @4M).  But the expansion KNOWS each record's canonical rank, so pairs
can be split into B contiguous RANK BANDS; each band's key is
(tile << shift) | (rank - band_base) with rank_bits - log2(B) bits — fused and
EXACT for B >= 2.  Canonical order is preserved per tile by walking band-0
windows before band-1 windows (the scalar-prefetch tables express any window
order).  Sort cost should drop both from the log^2 factor and per-key fusion.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_band_sort.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from splat_renderer_tpu.utils.timing import time_fn

P = 4_000_000  # headline pair-slot count (1M splats x cap 4)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tile = jax.random.randint(k1, (P,), 0, 8160, dtype=jnp.int32).astype(jnp.uint32)
    rank = jax.random.randint(k2, (P,), 0, 1_000_000, dtype=jnp.int32).astype(jnp.uint32)
    w_a = jax.random.bits(k3, (P,), dtype=jnp.uint32)
    w_rgb = jax.random.bits(k4, (P,), dtype=jnp.uint32)

    # reference: nk2 (exact today)
    def nk2(t, r, a, b):
        res = jax.lax.sort((t, r, a, b), num_keys=2, is_stable=False)
        return res[2], res[3]

    t, _ = time_fn(jax.jit(nk2), tile, rank, w_a, w_rgb, warmup=2, iters=5)
    print(f"nk2 exact 4M                 : {t*1e3:7.2f} ms")

    # fused nk1 at full size (the lossy fast profile)
    def nk1(t_, r, a, b):
        fused = (t_ << 19) | (r >> 1)
        res = jax.lax.sort((fused, a, b), num_keys=1, is_stable=False)
        return res[1], res[2]

    t, _ = time_fn(jax.jit(nk1), tile, rank, w_a, w_rgb, warmup=2, iters=5)
    print(f"nk1 coarse 4M (lossy)        : {t*1e3:7.2f} ms")

    # banded: B sequential sorts of P/B each, exact fused keys
    for B in (2, 4, 8):
        nb = P // B
        rb = 20 - (B - 1).bit_length()  # rank bits within band

        def banded(t_, r, a, b, B=B, nb=nb, rb=rb):
            outs = []
            for i in range(B):
                sl = slice(i * nb, (i + 1) * nb)
                fused = (t_[sl] << rb) | (r[sl] & jnp.uint32((1 << rb) - 1))
                res = jax.lax.sort((fused, a[sl], b[sl]), num_keys=1,
                                   is_stable=False)
                outs.append((res[1], res[2]))
            return outs

        t, _ = time_fn(jax.jit(banded), tile, rank, w_a, w_rgb, warmup=2, iters=5)
        print(f"banded B={B} exact ({nb//1000}k each) : {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
