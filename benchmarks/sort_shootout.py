"""Sort shootout: why binning rides XLA's variadic sort, not a radix sort.

The reference's flagship kernel is an 813-LoC WGSL radix sort
(/root/reference/src/shaders/radix-sort.wgsl, src/RadixSorter.ts:197-264):
4 passes of (histogram -> prefix-sum -> scatter) over 32-bit keys.  On a GPU
the scatter is a coalesced global write; on TPU there is NO vector scatter —
XLA lowers scatter through the scalar core at ~8 cycles/element.

This script times, on the real chip at the bench shape (4M records):

  1. the production path: one XLA variadic multi-key bitonic sort carrying
     the packed payload columns (what bin_splats_packed runs)
  2. the radix building blocks a TPU port would need:
     a. per-pass histogram   — cheap (the MXU one-hot trick, see
        binning._coverage_counts)
     b. per-pass scatter     — the showstopper: ONE radix pass's scatter of
        4M records already exceeds the ENTIRE multi-key sort, and a 13-bit
        tile id + 32-bit depth key needs 4-6 passes.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/sort_shootout.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from splat_renderer_tpu.utils.timing import time_fn

P = 4_000_000
T = 8160  # 1080p / 16px tiles


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    tile = jnp.sort(jax.random.randint(ks[0], (P,), 0, T, jnp.int32))  # realistic skew
    tile = jax.random.permutation(ks[5], tile)
    dk = jax.random.bits(ks[1], (P,), jnp.uint32)
    w0, w1, w2 = (jax.random.bits(k, (P,), jnp.uint32) for k in ks[2:5])
    out = {}

    # ---- 1. the production sort (canonical order: all columns are keys) ----
    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=5, is_stable=False))
    t, _ = time_fn(f, tile, dk, w0, w1, w2, warmup=2, iters=10)
    out["xla_sort_5col_full_ms"] = t * 1e3

    # 2-key variant (the cost floor without the deterministic tie-break)
    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=False))
    t, _ = time_fn(f, tile, dk, w0, w1, w2, warmup=2, iters=10)
    out["xla_sort_2key_5col_ms"] = t * 1e3

    # keys only — what a "sort keys, gather payload" design would sort
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
    t, _ = time_fn(f, tile, dk, warmup=2, iters=10)
    out["xla_sort_keys_only_ms"] = t * 1e3

    # ...plus the payload gather it would then need (3 columns by sorted index)
    idx = jax.random.permutation(ks[4], jnp.arange(P, dtype=jnp.int32))
    f = jax.jit(lambda i, a, b, c: (a[i], b[i], c[i]))
    t, _ = time_fn(f, idx, w0, w1, w2, warmup=2, iters=10)
    out["payload_gather_3col_ms"] = t * 1e3

    # ---- 2a. radix pass histogram (256 bins) — the cheap half ----
    def hist256(x):
        b = (x & 0xFF).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        onehot = (b[:, None] == cols).astype(jnp.float32)
        return jnp.sum(onehot, axis=0)  # XLA fuses this into an MXU-style sum

    t, _ = time_fn(jax.jit(hist256), dk, warmup=2, iters=10)
    out["radix_pass_histogram_ms"] = t * 1e3

    # ---- 2b. radix pass scatter — the showstopper ----
    # one pass must move every record to its bucket slot: a 4M-element
    # scatter (8-bit pass => 4 passes for 32-bit keys, 6 for tile+depth)
    dst = jax.random.permutation(ks[3], jnp.arange(P, dtype=jnp.int32))

    def scatter_pass(dst, a, b, c, d2):
        z = jnp.zeros((P,), jnp.uint32)
        return (
            z.at[dst].set(a),
            z.at[dst].set(b),
            z.at[dst].set(c),
            z.at[dst].set(d2),
        )

    t, _ = time_fn(jax.jit(scatter_pass), dst, dk, w0, w1, w2, warmup=1, iters=3)
    out["radix_pass_scatter_4col_ms"] = t * 1e3
    out["radix_4pass_estimate_ms"] = 4 * (
        out["radix_pass_histogram_ms"] + out["radix_pass_scatter_4col_ms"]
    )

    for k_, v in out.items():
        out[k_] = round(v, 2)
    out["verdict"] = (
        "radix loses: one pass's scatter alone costs "
        f"{out['radix_pass_scatter_4col_ms']:.0f} ms vs "
        f"{out['xla_sort_5col_full_ms']:.0f} ms for the ENTIRE multi-key sort"
        if out["radix_pass_scatter_4col_ms"] > out["xla_sort_5col_full_ms"]
        else "radix competitive — revisit binning design!"
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
