"""Isolated blend-kernel timing across tile geometries and block sizes.

Motivated by a round-3 anomaly: halving the blend's pixels-per-record
(tile 32x32 -> 32x16 at the same class-capped pair rows) moved the fused
exact frame by only ~0.2 ms where a pure pair-pixel-work model predicts
~3-4 ms (benchmarks/probe_tile_size.py).  Either the blend is not
panel-work bound, or the bin stage absorbed the difference.  This probe
separates them: it pre-bins each geometry ONCE (untimed), then times the
Pallas blend alone (tile kernel, steady-state capacity) and the binning
alone, across block sizes — so per-window/step overhead, lead-in waste,
and panel work can be told apart.

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/probe_blend_iso.py [--n 1000000]

Isolated numbers carry the ~1.5-2.8 ms relay dispatch constant (CLAUDE.md);
deltas between variants at the SAME dispatch shape are trustworthy.
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
    _class_caps, model_points, splat_screen_data,
)
from splat_renderer_tpu.utils.timing import time_fn

W, H = 1920, 1080


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--blocks", default="1024,2048,4096")
    args = ap.parse_args()
    n = args.n
    blocks = [int(b) for b in args.blocks.split(",")]

    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params, key = scene.params(), jax.random.PRNGKey(0)
    base = RenderConfig(width=W, height=H, base_radius=0.008,
                        tiles_per_splat_cap=4)
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, n, PointConfig(), base)
    )(params, key)

    for tw, th, use_cc in ((16, 16, False), (32, 32, True), (32, 16, True)):
        cfg = base.replace(tile_size=tw, tile_height=th)
        data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(
            splats, camera)
        for block in blocks:
            bin_j = jax.jit(
                lambda d, cc=None: bin_splats_packed(d, cfg, block,
                                                     class_caps=cc)
            )
            st0 = bin_j(data)
            cc = None
            if use_cc:
                # census from the full expansion's footprint classes
                img_probe = jax.jit(
                    lambda d: render_tiles_pallas(
                        d, None, cfg, block=block, kernel="tile",
                        return_stats=True)
                )(data)
                n_hi, n_mid = (
                    int(x) for x in np.asarray(img_probe[1]["class_counts"])
                )
                cc = _class_caps(n_hi, n_mid, n, cfg.tiles_per_splat_cap)
            t_bin, st = time_fn(
                jax.jit(lambda d: bin_splats_packed(d, cfg, block,
                                                    class_caps=cc)),
                data, warmup=2, iters=5,
            )
            tiles_used = int(np.asarray(st["tiles_used"]))
            mt = int(tiles_used * 1.15) + 8
            rows = int(st["pair_w"].shape[0])
            t_blend, _ = time_fn(
                jax.jit(lambda d, b: render_tiles_pallas(
                    d, b, cfg, block=block, kernel="tile", max_blocks=mt)),
                data, st, warmup=2, iters=5,
            )
            pair_px = rows * 128 * cfg.tile_pixels / 1e9
            print(f"tile={tw}x{th} block={block} cc={'on' if cc else 'off'} "
                  f"rows128={rows} pair_px={pair_px:.2f}G tiles={tiles_used} "
                  f"bin_ms={t_bin*1e3:.2f} blend_ms={t_blend*1e3:.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
