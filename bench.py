"""Benchmark: 1M splats composited at 1080p on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": FPS, "unit": "fps", "vs_baseline": FPS/60, ...}

Baseline: the reference's north-star target of 1M splats @ 60 FPS
(3D_PLAN.md:379-382; BASELINE.md "Targets"), so vs_baseline = fps / 60.
Extra fields carry the per-stage breakdown (project/sort/bin/blend ms) that
BASELINE.json's metric asks for.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import model_points, splat_screen_data
from splat_renderer_tpu.utils.timing import time_fn

N_SPLATS = 1_000_000
WIDTH, HEIGHT = 1920, 1080
BLOCK = 256


def _demo_scene():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    return spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))


def main() -> None:
    scene = _demo_scene()
    # 1M splats at 1080p: small world radius keeps footprints at a few
    # pixels, the physically sensible regime at this density.
    rcfg = RenderConfig(
        width=WIDTH, height=HEIGHT, base_radius=0.008, tiles_per_splat_cap=4
    )
    pcfg = PointConfig(descent_steps=5)
    cam = spt.Camera(aspect=WIDTH / HEIGHT)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params = scene.params()
    key = jax.random.PRNGKey(0)

    # ---- stage-isolated timings ----
    model_j = jax.jit(lambda p, k: model_points(scene, p, k, N_SPLATS, pcfg, rcfg))
    t_model, splats = time_fn(model_j, params, key, warmup=2, iters=5)

    project_j = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))
    t_project, data = time_fn(project_j, splats, camera, warmup=2, iters=5)

    # depth sort is folded into the pair sort's secondary key (bin stage)
    t_sort = 0.0

    bin_j = jax.jit(lambda d: bin_splats_packed(d, rcfg, BLOCK))
    t_bin, binned = time_fn(bin_j, data, warmup=2, iters=5)

    blend_j = jax.jit(lambda d, b: render_tiles_pallas(d, b, rcfg, block=BLOCK))
    t_blend, img = time_fn(blend_j, data, binned, warmup=2, iters=5)

    # ---- full fused frame (render-only: splats -> image) ----
    def full(s, c):
        d = splat_screen_data(s, c, rcfg)
        return render_tiles_pallas(d, None, rcfg, block=BLOCK)

    full_j = jax.jit(full)
    t_full, _ = time_fn(full_j, splats, camera, warmup=2, iters=5)

    # ---- BASELINE config 4: animated scene, modeler + render fused ----
    def animated(p, c, k):
        s = model_points(scene, p, k, 500_000, pcfg, rcfg)
        d = splat_screen_data(s, c, rcfg)
        return render_tiles_pallas(d, None, rcfg, block=BLOCK)

    anim_j = jax.jit(animated)
    t_anim, _ = time_fn(anim_j, params, camera, key, warmup=2, iters=5)

    # ---- BASELINE config 5 (scaled): multi-view datagen, 4 views ----
    from splat_renderer_tpu.render import render_views

    cams4 = {k_: jnp.asarray(v) for k_, v in
             spt.orbit_ring(4, aspect=WIDTH / HEIGHT).items()}
    mv_j = jax.jit(lambda s, c: render_views(s, c, rcfg, "pallas", BLOCK))
    t_mv, _ = time_fn(mv_j, splats, cams4, warmup=1, iters=3)

    # ---- the reference's LIVE path: opaque oriented surface @1M ----
    scfg = spt.surface_render_config(
        WIDTH, HEIGHT, base_radius=0.004, tiles_per_splat_cap=4
    )
    def surface(p, c, k):
        s = model_points(scene, p, k, N_SPLATS, pcfg, scfg)
        d = splat_screen_data(s, c, scfg)
        return render_tiles_pallas(d, None, scfg, block=BLOCK)

    surf_j = jax.jit(surface)
    t_surf, _ = time_fn(surf_j, params, camera, key, warmup=2, iters=5)

    fps = 1.0 / t_full
    result = {
        "metric": "fps_1080p_1m_splats",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
        "msplats_per_sec": round(N_SPLATS * fps / 1e6, 2),
        "frame_ms": round(t_full * 1e3, 3),
        "project_ms": round(t_project * 1e3, 3),
        "sort_ms": round(t_sort * 1e3, 3),
        "bin_ms": round(t_bin * 1e3, 3),
        "blend_ms": round(t_blend * 1e3, 3),
        "model_stage_ms": round(t_model * 1e3, 3),
        "animated_frame_ms_500k": round(t_anim * 1e3, 3),
        "multiview4_ms": round(t_mv * 1e3, 3),
        "surface_opaque_frame_ms_1m": round(t_surf * 1e3, 3),
        "n_splats": N_SPLATS,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
