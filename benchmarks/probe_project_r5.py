"""Decompose the project+pack stage (P1 = splat_screen_words) at the
1M @1080p headline shape — VERDICT r4 item 1(c).

P1 measures ~3.5 ms after dispatch subtraction (BENCH_r04) but its op
model (one fused elementwise pass over ~11 input planes, ~135 elem-ops
per splat) predicts well under 1 ms.  Where does it go?  In-process
interleaved sub-stage programs (same dispatch shape -> deltas meaningful):

  A: project_planes only (clip FMAs + 6-offset radius loop)
  B: A minus the 6-offset loop (radius = crude w-scale)    [loop cost]
  C: shade_planes (A + lighting/appearance)
  D: screen_planes (C + quantization)
  E: splat_screen_words (D + word packing)                 [full P1]

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_project_r5.py
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
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.render.projector import (
    project_planes,
    screen_planes,
    shade_planes,
    splat_screen_words,
)
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
W, H = 1920, 1080


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

    def a_project(s, c):
        return project_planes(c["view_proj"], c["cam_pos"], s["px"],
                              s["py"], s["pz"], s["radius"], rcfg)

    def b_noloop(s, c):
        # projection without the 6-offset loop: radius ~ r * f / w (crude)
        vp, cp = c["view_proj"], c["cam_pos"]
        px, py, pz, radii = s["px"], s["py"], s["pz"], s["radius"]
        clip = [vp[j, 0] * px + vp[j, 1] * py + vp[j, 2] * pz + vp[j, 3]
                for j in range(4)]
        w_c = clip[3]
        sw = jnp.where(jnp.abs(w_c) < 1e-8, 1e-8, w_c)
        cx = (clip[0] / sw + 1.0) * (0.5 * W)
        cy = (1.0 - clip[1] / sw) * (0.5 * H)
        dx, dy, dz = px - cp[0], py - cp[1], pz - cp[2]
        depth = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        sr = jnp.minimum(radii * (0.5 * H) * jnp.abs(vp[1, 1]) / sw,
                         rcfg.r_cap)
        valid = w_c > 1e-6
        return {"cx": cx, "cy": cy,
                "depth": jnp.where(valid, depth, jnp.inf),
                "radius": jnp.where(valid, sr, 0.0)}

    def c_shade(s, c):
        return shade_planes(s, c["view_proj"], c["cam_pos"], rcfg)

    def d_screen(s, c):
        return screen_planes(s, c["view_proj"], c["cam_pos"], rcfg)

    def e_words(s, c):
        return splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)

    variants = [("A project", a_project), ("B no-loop", b_noloop),
                ("C shade", c_shade), ("D screen", d_screen),
                ("E words", e_words)]
    fns = [(name, jax.jit(f)) for name, f in variants]
    for name, f in fns:
        jax.device_get(jax.tree.leaves(f(splats, camera))[0].ravel()[:1])
        print(f"compiled {name}", file=sys.stderr)
    t_disp, _ = time_fn(jax.jit(lambda v: v + 1.0), jnp.ones((8, 128)),
                        warmup=3, iters=20)
    print(f"dispatch overhead: {t_disp * 1e3:.3f} ms", file=sys.stderr)

    results = {name: [] for name, _ in fns}
    for burst in range(4):
        for name, f in fns:
            t, _ = time_fn(f, splats, camera, warmup=1, iters=5)
            results[name].append(t * 1e3)
    for name, ts in results.items():
        print(f"{name}: bursts {['%.2f' % t for t in ts]}  min "
              f"{min(ts):.3f} ms  (minus dispatch "
              f"{min(ts) - t_disp * 1e3:.3f})")


if __name__ == "__main__":
    main()
