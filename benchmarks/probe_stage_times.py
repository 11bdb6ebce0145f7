"""Quick stage timing probe at the bench headline shape (1M @1080p, cap=4).

Times the SoA words path end-to-end pieces on the real chip:
  project+pack words / bin (words) / blend (steady class) / full fused frame.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_stage_times.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_packed_words
from splat_renderer_tpu.render.pipeline import model_points, render_splats
from splat_renderer_tpu.render.projector import splat_screen_words
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
rcfg = RenderConfig(width=1920, height=1080, base_radius=0.008, tiles_per_splat_cap=4)

s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
cam = spt.Camera(aspect=1920 / 1080)
camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}

splats = jax.jit(
    lambda p, k: model_points(scene, p, k, N, PointConfig(), rcfg)
)(scene.params(), jax.random.PRNGKey(0))


def words_fn(s, c):
    return splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)

t_w, words = time_fn(jax.jit(words_fn), splats, camera, warmup=2, iters=5)

bin_j = jax.jit(lambda w: bin_packed_words(w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"], rcfg, 1024))
t_bin, binned = time_fn(bin_j, words, warmup=2, iters=5)
used = int(np.asarray(binned["block_off"])[-1])
mb = max(1024, -(-int(used * 1.25) // 1024) * 1024)
print(f"blocks_used={used} class={mb} pair_w lanes={binned['pair_w'].shape[1]}")

blend_j = jax.jit(lambda b: render_tiles_pallas(None, b, rcfg, block=1024, max_blocks=mb))
t_blend, img = time_fn(blend_j, binned, warmup=2, iters=5)

full_j = jax.jit(lambda s, c: render_splats(s, c, rcfg, "pallas", blend_max_blocks=mb))
t_full, _ = time_fn(full_j, splats, camera, warmup=2, iters=5)

print(f"project+pack words: {t_w*1e3:7.2f} ms")
print(f"bin (words)       : {t_bin*1e3:7.2f} ms")
print(f"blend (class)     : {t_blend*1e3:7.2f} ms")
print(f"full frame        : {t_full*1e3:7.2f} ms  ({1.0/t_full:.1f} FPS)")
