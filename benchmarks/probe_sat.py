"""A/B: saturation-check spacing (sat_every) at blend group=256, fused
1M@1080p headline shape.

sat_every was tuned to 2 at group=128 (NOTES round 2: the per-group (1,1)
max sync costs more than the compute it skips when checked every group).
group=256 halves the number of groups AND doubles the records each check
covers, so the sync-vs-skipped-compute balance moves: sat_every=1 at
group=256 checks every 256 records (the SAME granularity as the old
128/sat2 default) while paying half the syncs; sat_every=2 checks every
512.  Measure all of (group, sat_every) in {128, 256} x {1, 2, 4}
in-process interleaved (cross-run A/B over the relay is weather,
CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_sat.py
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_packed_words, bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    _class_caps,
    model_points,
    splat_screen_data,
)
from splat_renderer_tpu.render.projector import splat_screen_words
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
W, H = 1920, 1080
BLOCK = 1024


def main() -> None:
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    rcfg = RenderConfig(width=W, height=H, base_radius=0.008,
                        tiles_per_splat_cap=4, tile_size=32, tile_height=16)
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, PointConfig(), rcfg)
    )(scene.params(), jax.random.PRNGKey(0))

    b32 = jax.jit(lambda s, c: bin_splats_packed(
        splat_screen_data(s, c, rcfg), rcfg, BLOCK))(splats, camera)
    mt = int(np.asarray(b32["tiles_used"]) * 1.15) + 8
    n_hi, n_mid = (int(x) for x in np.asarray(b32["class_counts"]))
    cc = _class_caps(n_hi, n_mid, N, rcfg.tiles_per_splat_cap)
    print(f"class caps: {cc}", file=sys.stderr)

    def full(s, c, group, sat):
        w = splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)
        binned = bin_packed_words(w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"],
                                  rcfg, BLOCK, class_caps=cc)
        return render_tiles_pallas(None, binned, rcfg, block=BLOCK,
                                   max_blocks=mt, kernel="tile",
                                   group=group, sat_every=sat)

    variants = [(g, s) for g in (128, 256) for s in (1, 2, 4)]
    fns = {v: jax.jit(lambda s_, c_, v=v: full(s_, c_, v[0], v[1]))
           for v in variants}
    for v, f in fns.items():  # compile
        np.asarray(jax.device_get(f(splats, camera)))
        print(f"compiled g{v[0]}/sat{v[1]}", file=sys.stderr)

    results = {v: [] for v in variants}
    for burst in range(5):
        for v, f in fns.items():
            t, _ = time_fn(f, splats, camera, warmup=1, iters=5)
            results[v].append(t * 1e3)
    for v, ts in results.items():
        print(f"group={v[0]} sat_every={v[1]}: "
              f"bursts {['%.2f' % t for t in ts]}  min {min(ts):.3f} ms")


if __name__ == "__main__":
    main()
