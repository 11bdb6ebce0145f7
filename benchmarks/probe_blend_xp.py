"""Cross-tile window-0 DMA prefetch: parity + interleaved A/B timing.

The base tile-major kernel starts each tile's first window DMA at the top of
its own grid step and immediately waits it, exposing the DMA issue latency
serially per nonempty tile (~1-2 us x ~4k tiles at the 1M @1080p bench
shape).  _make_tile_kernel_xp prefetches the NEXT tile's window 0 during the
current tile's compute (ops/tile_blend.py).  This probe:

  1. bit-compares tile vs tile_xp images at the bench shape, eps=default AND
     eps=0 (the parity mode where saturation never engages);
  2. times both INTERLEAVED in one process (old-new-old-new dispatch bursts)
     — cross-run A/B on the relay is unresolvable (NOTES.md: identical turbo
     code measured 25.3/27.4/34.7 ms across runs).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_blend_xp.py
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    _class_caps, model_points, render_splats, splat_screen_data,
)
from splat_renderer_tpu.utils.timing import time_fn

W, H = 1920, 1080


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    n = args.n

    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params, key = scene.params(), jax.random.PRNGKey(0)

    # headline geometry: 32x16 tiles + class-partitioned pair expansion
    cfg = RenderConfig(width=W, height=H, base_radius=0.008,
                       tiles_per_splat_cap=4, tile_size=32, tile_height=16)
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, n, PointConfig(), cfg)
    )(params, key)
    data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(splats, camera)
    binned = jax.jit(lambda d: bin_splats_packed(d, cfg, 1024))(data)
    mt = int(np.asarray(binned["tiles_used"]) * 1.15) + 8

    _, stats = jax.jit(
        lambda s, c: render_splats(s, c, cfg, "pallas", 1024,
                                   blend_max_blocks=mt, blend_kernel="tile",
                                   return_stats=True)
    )(splats, camera)
    n_hi, n_mid = (int(x) for x in np.asarray(stats["class_counts"]))
    cc = _class_caps(n_hi, n_mid, n, cfg.tiles_per_splat_cap)

    # ---- 1. parity: bit-identical images, blend-only, both eps modes ----
    for eps in (-1.0, 0.0):
        imgs = {}
        for k in ("tile", "tile_xp"):
            imgs[k] = np.asarray(jax.device_get(jax.jit(
                lambda d, b, k=k, e=eps: render_tiles_pallas(
                    d, b, cfg, block=1024, kernel=k, max_blocks=mt, eps=e)
            )(data, binned)))
        same = np.array_equal(imgs["tile"], imgs["tile_xp"])
        print(f"eps={'default' if eps < 0 else eps}: bit-identical={same} "
              f"maxdiff={np.abs(imgs['tile'] - imgs['tile_xp']).max():.3e}",
              flush=True)
        assert same, "tile_xp diverged from tile — DMA scheduling bug"

    # ---- 2. interleaved fused-frame A/B (full frame, class caps) ----
    def frame(kern):
        return jax.jit(lambda s, c: render_splats(
            s, c, cfg, "pallas", 1024, blend_max_blocks=mt,
            blend_kernel=kern, pair_class_caps=cc))

    fa, fb = frame("tile"), frame("tile_xp")
    ta_all, tb_all = [], []
    for r in range(args.rounds):
        ta, _ = time_fn(fa, splats, camera, warmup=1 if r == 0 else 0, iters=5)
        tb, _ = time_fn(fb, splats, camera, warmup=1 if r == 0 else 0, iters=5)
        ta_all.append(ta * 1e3)
        tb_all.append(tb * 1e3)
        print(f"round {r}: tile {ta*1e3:.2f} ms | tile_xp {tb*1e3:.2f} ms",
              flush=True)
    print(f"best: tile {min(ta_all):.2f} ms | tile_xp {min(tb_all):.2f} ms | "
          f"delta {min(ta_all) - min(tb_all):+.2f} ms", flush=True)

    # ---- 3. blend-only interleaved (isolates the DMA-latency claim) ----
    ba = jax.jit(lambda d, b: render_tiles_pallas(
        d, b, cfg, block=1024, kernel="tile", max_blocks=mt))
    bb = jax.jit(lambda d, b: render_tiles_pallas(
        d, b, cfg, block=1024, kernel="tile_xp", max_blocks=mt))
    ta_all, tb_all = [], []
    for r in range(args.rounds):
        ta, _ = time_fn(ba, data, binned, warmup=1 if r == 0 else 0, iters=5)
        tb, _ = time_fn(bb, data, binned, warmup=1 if r == 0 else 0, iters=5)
        ta_all.append(ta * 1e3)
        tb_all.append(tb * 1e3)
        print(f"blend round {r}: tile {ta*1e3:.2f} ms | tile_xp "
              f"{tb*1e3:.2f} ms", flush=True)
    print(f"blend best: tile {min(ta_all):.2f} ms | tile_xp "
          f"{min(tb_all):.2f} ms | delta {min(ta_all) - min(tb_all):+.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
