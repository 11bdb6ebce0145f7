"""Blend block-size sweep: per-window overhead vs group-skip granularity.

Bigger windows amortize the per-step floor over more records but DMA and
lead-in/tail waste grow (window bases round down to a block multiple).
Group-level skips keep COMPUTE constant, so this isolates the overhead term.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_block_sweep.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import model_points, splat_screen_data
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
rcfg = RenderConfig(width=1920, height=1080, base_radius=0.008,
                    tiles_per_splat_cap=4)


def main():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    cam = spt.Camera(aspect=1920 / 1080)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, PointConfig(), rcfg)
    )(scene.params(), jax.random.PRNGKey(0))
    data = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(splats, camera)

    ref = None
    for block in (1024, 2048, 4096):
        binned = jax.jit(
            lambda d: bin_splats_packed(d, rcfg, block), static_argnums=()
        )(data)
        used = int(np.asarray(binned["block_off"])[-1])
        tiles_used = int(np.asarray(binned["tiles_used"]))
        mb_flat = int(used * 1.15) + 8
        mt = int(tiles_used * 1.1) + 8
        print(f"block={block}: windows {used} (class {mb_flat}), "
              f"tiles {tiles_used} (class {mt})")
        for kernel, mb in (("flat", mb_flat), ("tile", mt)):
            f = jax.jit(lambda d, b: render_tiles_pallas(
                d, b, rcfg, block=block, eps=-1.0, max_blocks=mb,
                kernel=kernel))
            t, img = time_fn(f, data, binned, warmup=2, iters=5)
            tag = ""
            if ref is None:
                ref = np.asarray(img)
            else:
                tag = f"  maxdiff={np.abs(np.asarray(img) - ref).max():.2e}"
            print(f"  {kernel:4} block={block:4}: {t*1e3:7.2f} ms{tag}")


if __name__ == "__main__":
    main()
