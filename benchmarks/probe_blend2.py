"""Blend overhead diagnosis: where do the eps=inf 8.7 ms go?

With every window skipped (eps=inf) the kernel should cost ~0.4 us/step
(the trash-step floor), but measures ~2.2 us/step.  Suspects: per-step input
window DMA cycling (block_window changes every step) and out-block cycling
(block_tile changes every ~3 steps).  Doctor the scalar tables to pin each
index constant and difference the runtimes.  Results are garbage; timing only.

Also: sat_every sweep (per-group saturation checks cost a (1,1) max sync).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_blend2.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import pallas_blend_tiles
from splat_renderer_tpu.render.binning import bin_packed_words
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.render.projector import splat_screen_words
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
    words = jax.jit(
        lambda s, c: splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)
    )(splats, camera)
    binned = jax.jit(lambda w: bin_packed_words(
        w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"], rcfg, BLOCK))(words)
    used = int(np.asarray(binned["block_off"])[-1])
    mb = int(used * 1.25) + 8

    def run(name, bt, bf, bw, bl0, bc, eps, sat_every=1, strip=0):
        f = jax.jit(lambda pw, a, b, c, d, e: pallas_blend_tiles(
            pw, a, b, c, d, e, binned["counts"], rcfg, block=BLOCK,
            eps=eps, sat_every=sat_every, _strip=strip))
        t, _ = time_fn(f, binned["pair_w"], bt[:mb], bf[:mb], bw[:mb],
                       bl0[:mb], bc[:mb], warmup=2, iters=5)
        print(f"{name:36}: {t*1e3:7.2f} ms")
        return t

    bt, bf = binned["block_tile"], binned["block_first"]
    bw, bl0, bc = binned["block_window"], binned["block_local0"], binned["block_count"]
    z = jnp.zeros_like(bt)
    bf0 = jnp.zeros_like(bf).at[0].set(1)

    inf = float(np.inf)
    run("baseline eps=inf", bt, bf, bw, bl0, bc, inf)
    run("strip1 (no live max)", bt, bf, bw, bl0, bc, inf, strip=1)
    run("strip2 (+no init/flush)", bt, bf, bw, bl0, bc, inf, strip=2)
    run("strip3 (bare scaffolding)", bt, bf, bw, bl0, bc, inf, strip=3)
    run("strip3 const window", bt, bf, z, bl0, bc, inf, strip=3)
    run("baseline eps=dflt", bt, bf, bw, bl0, bc, -1.0)
    run("baseline eps=0", bt, bf, bw, bl0, bc, 0.0)


if __name__ == "__main__":
    main()
