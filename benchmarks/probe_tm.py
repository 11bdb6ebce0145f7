"""Tile-major vs flat blend kernel at the bench shape (1M @1080p).

The flat kernel pays the Mosaic per-grid-step floor (~1.8 us even for an
empty body — benchmarks/probe_blend2.py) once per WINDOW (~4k steps); the
tile-major kernel pays it once per NONEMPTY TILE (~1.4k steps) and its
while-loop saturation exit stops the window DMA entirely.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_tm.py
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
BLOCK = 1024


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
    binned = jax.jit(lambda d: bin_splats_packed(d, rcfg, BLOCK))(data)
    used = int(np.asarray(binned["block_off"])[-1])
    tiles_used = int(np.asarray(binned["tiles_used"]))
    mb_flat = int(used * 1.25) + 8
    mt = int(tiles_used * 1.1) + 8
    print(f"windows used {used} (class {mb_flat}); tiles used {tiles_used} (class {mt})")

    def run(name, kernel, mb, eps, sat_every=1):
        f = jax.jit(lambda d, b: render_tiles_pallas(
            d, b, rcfg, block=BLOCK, eps=eps, max_blocks=mb,
            sat_every=sat_every, kernel=kernel))
        t, img = time_fn(f, data, binned, warmup=2, iters=5)
        print(f"{name:40}: {t*1e3:7.2f} ms")
        return np.asarray(img)

    i1 = run("flat eps=dflt", "flat", mb_flat, -1.0)
    i2 = run("tile eps=dflt", "tile", mt, -1.0)
    print("   max diff flat vs tile (dflt):", np.abs(i1 - i2).max())
    i3 = run("flat eps=0", "flat", mb_flat, 0.0)
    i4 = run("tile eps=0", "tile", mt, 0.0)
    print("   bit-equal at eps=0:", np.array_equal(i3, i4))
    for se in (2, 4):
        run(f"tile eps=dflt sat_every={se}", "tile", mt, -1.0, se)
    # fast profile: MUST re-bin with fast_math (the flag lives in the pair
    # sort, not the kernel) — timing includes the re-binning
    rf = rcfg.replace(fast_math=True)
    f = jax.jit(lambda d: render_tiles_pallas(
        d, bin_splats_packed(d, rf, BLOCK), rf, block=BLOCK, eps=-1.0,
        max_blocks=mt, kernel="tile"))
    t, imgf = time_fn(f, data, warmup=2, iters=5)
    print(f"{'tile fast bin+blend eps=dflt':40}: {t*1e3:7.2f} ms (incl. bin)")
    print("   max diff fast vs exact:", np.abs(np.asarray(imgf) - i2).max())


if __name__ == "__main__":
    main()
