"""Round-2 perf probe: where do bin's 22 ms and blend's 34.7 ms actually go?

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_blend.py

Prints a stage-by-stage breakdown of the bench workload (1M splats @1080p,
cap=4, block=256):
  - binning sub-stages (footprint/expand, pack, variadic sort, offsets, block
    metadata) timed in isolation
  - pair/tile statistics (active pairs, run-length histogram, live windows)
  - blend kernel with eps=0 (no early exit), default eps, and eps=inf
    (every window skipped -> pure per-grid-step overhead), over block sizes
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import pallas_blend_tiles
from splat_renderer_tpu.render.binning import _tile_footprint, bin_splats_packed
from splat_renderer_tpu.render.packing import depth_bits, pack_records
from splat_renderer_tpu.render.pipeline import model_points, splat_screen_data
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
W, H = 1920, 1080


def main():
    scene = spt.SDFScene(
        spt.smooth_union(
            0.1,
            spt.smooth_union(
                0.15,
                spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5),
                spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
            ),
            spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25),
        )
    )
    rcfg = RenderConfig(width=W, height=H, base_radius=0.008, tiles_per_splat_cap=4)
    pcfg = PointConfig(descent_steps=5)
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    key = jax.random.PRNGKey(0)

    splats = jax.jit(lambda p, k: model_points(scene, p, k, N, pcfg, rcfg))(
        scene.params(), key
    )
    data = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(splats, camera)
    out = {}

    # ---------- binning sub-stages ----------
    cap = rcfg.tiles_per_splat_cap
    num_tiles = rcfg.num_tiles

    def expand(d):
        tx0, ty0, w, h = _tile_footprint(d, rcfg)
        n = tx0.shape[0]
        c = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        wb = w[None, :]
        dy = jnp.zeros_like(c)
        for k in range(1, cap):
            dy = dy + (c >= k * wb).astype(jnp.int32)
        dx = c - dy * wb
        tile = (ty0[None, :] + dy) * rcfg.tiles_x + (tx0[None, :] + dx)
        active = c < (w * h)[None, :]
        return jnp.where(active, tile, num_tiles).reshape(-1)

    def packwords(d):
        return pack_records(d, rcfg) + (depth_bits(d[:, 7]),)

    def dosort(tile, dkeys, w0, w1, w2):
        def bc(x):
            return jnp.broadcast_to(x[None, :], (cap, N)).reshape(-1)

        return jax.lax.sort(
            (tile, bc(dkeys), bc(w0), bc(w1), bc(w2)), num_keys=2, is_stable=False
        )

    def offsets_of(pair_tile):
        boundaries = jax.lax.broadcasted_iota(jnp.int32, (num_tiles + 1, 1), 0)[:, 0]
        return jnp.searchsorted(pair_tile, boundaries, side="left").astype(jnp.int32)

    t, tile = time_fn(jax.jit(expand), data, warmup=2, iters=10)
    out["bin_expand_ms"] = t * 1e3
    t, (w0, w1, w2, dkeys) = time_fn(jax.jit(packwords), data, warmup=2, iters=10)
    out["bin_pack_ms"] = t * 1e3
    t, res = time_fn(jax.jit(dosort), tile, dkeys, w0, w1, w2, warmup=2, iters=10)
    out["bin_sort5_ms"] = t * 1e3
    pair_tile = res[0]
    t, offsets = time_fn(jax.jit(offsets_of), pair_tile, warmup=2, iters=10)
    out["bin_offsets_ms"] = t * 1e3

    # sort cost scaling: keys only (2 cols) vs full 5-col
    def dosort2(tile, dkeys):
        def bc(x):
            return jnp.broadcast_to(x[None, :], (cap, N)).reshape(-1)

        return jax.lax.sort((tile, bc(dkeys)), num_keys=2, is_stable=False)

    t, _ = time_fn(jax.jit(dosort2), tile, dkeys, warmup=2, iters=10)
    out["bin_sort2_ms"] = t * 1e3

    # stable variant of the full sort (tie-break cost probe)
    def dosort5_stable(tile, dkeys, w0, w1, w2):
        def bc(x):
            return jnp.broadcast_to(x[None, :], (cap, N)).reshape(-1)

        return jax.lax.sort(
            (tile, bc(dkeys), bc(w0), bc(w1), bc(w2)), num_keys=2, is_stable=True
        )

    t, _ = time_fn(jax.jit(dosort5_stable), tile, dkeys, w0, w1, w2, warmup=2, iters=10)
    out["bin_sort5_stable_ms"] = t * 1e3

    # ---------- pair statistics ----------
    for block in (256,):
        binned = jax.jit(
            lambda d: bin_splats_packed(d, rcfg, block), static_argnums=()
        )(data)
        counts = np.asarray(binned["counts"])
        out["active_pairs"] = int(counts.sum())
        out["tiles_nonempty"] = int((counts > 0).sum())
        out["count_p50"] = float(np.percentile(counts[counts > 0], 50))
        out["count_p90"] = float(np.percentile(counts[counts > 0], 90))
        out["count_p99"] = float(np.percentile(counts[counts > 0], 99))
        out["count_max"] = int(counts.max())
        out["tiles_gt_2k"] = int((counts > 2000).sum())
        out["tiles_gt_8k"] = int((counts > 8000).sum())
        out["n_blocks_used"] = int(np.asarray(binned["block_off"])[-1])
        out["n_blocks_cap"] = int(binned["block_tile"].shape[0])
        # radius-clamp stats
        r = np.asarray(data[:, 2])
        k = max(int(rcfg.tiles_per_splat_cap**0.5), 2)
        r_max = (k - 1) * rcfg.tile_size / (2.0 * rcfg.bounds_margin)
        out["r_max_px"] = r_max
        out["frac_at_r_cap"] = float((r >= r_max - 1e-3).mean())
        out["r_p50"] = float(np.percentile(r, 50))
        out["r_p99"] = float(np.percentile(r, 99))

    # ---------- blend kernel ----------
    for block in (128, 256, 512):
        binned = jax.jit(lambda d: bin_splats_packed(d, rcfg, block))(data)
        args = (
            binned["pair_w0"], binned["pair_w1"], binned["pair_w2"],
            binned["block_tile"], binned["block_first"], binned["start_units"],
            binned["block_off"], binned["offsets"], binned["counts"],
        )

        def blend(eps):
            return jax.jit(
                lambda *a: pallas_blend_tiles(*a, rcfg, block=block, eps=eps)
            )

        t, _ = time_fn(blend(0.0), *args, warmup=2, iters=10)
        out[f"blend_b{block}_eps0_ms"] = t * 1e3
        t, _ = time_fn(blend(0.01), *args, warmup=2, iters=10)
        out[f"blend_b{block}_ms"] = t * 1e3
        t, _ = time_fn(blend(1e9), *args, warmup=2, iters=10)
        out[f"blend_b{block}_skipall_ms"] = t * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
