"""Benchmark: the five BASELINE.json configs on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": FPS, "unit": "fps", "vs_baseline": FPS/60, ...}

Baseline: the reference's north-star target of 1M splats @ 60 FPS
(3D_PLAN.md:379-382; BASELINE.md "Targets"), so vs_baseline = fps / 60.
Extra fields carry the per-stage breakdown (project/bin/sort/blend ms) plus
all five BASELINE configs:
  1. oracle_10k_256_ms      — SequentialRenderer parity config
  2. frame_720p_100k_ms     — tile pipeline small
  3. fps_1080p_1m_splats    — full GPU-pipeline parity (headline)
  4. animated_120f_s        — 500k animated over 120 frames incl. host loop
  5. multiview8_2m_ms       — 8 views x 2M splats @1080p, one fused program

Stage accounting: bin_ms is the FULL binning pass (which contains the pair
sort); sort_ms is the isolated pair sort so the sort's share is visible.
blend_ms uses the steady-state capacity class (pipeline.Engine protocol) —
the first frame per scene runs at the safe worst-case grid bound.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    model_points,
    render_splats,
    splat_screen_data,
)
from splat_renderer_tpu.utils.timing import time_fn

N_SPLATS = 1_000_000
WIDTH, HEIGHT = 1920, 1080
BLOCK = 1024


def _demo_scene():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    return spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))


def _capacity_class(data, rcfg, block=BLOCK, headroom=1.25) -> int:
    """One safe-bound binning to size the steady-state blend capacity class
    (1024-granular, mirroring pipeline.Engine's protocol)."""
    binned = jax.jit(lambda d: bin_splats_packed(d, rcfg, block))(data)
    used = int(np.asarray(binned["block_off"])[-1])
    return max(1024, -(-int(used * headroom) // 1024) * 1024)


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

    # ---- stage-isolated timings (headline config 3) ----
    model_j = jax.jit(lambda p, k: model_points(scene, p, k, N_SPLATS, pcfg, rcfg))
    t_model, splats = time_fn(model_j, params, key, warmup=2, iters=5)

    # the Pallas frame's actual projection stage: plane SoA -> packed words
    from splat_renderer_tpu.render.projector import project_planes, splat_screen_words

    project_j = jax.jit(
        lambda s, c: splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)
    )
    t_project, _ = time_fn(project_j, splats, camera, warmup=2, iters=5)
    data = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(splats, camera)

    # radius-cap stats (the capacity clamp the reference merely warns about,
    # src/GPUTileBinner.ts:265-281)
    proj = jax.jit(
        lambda s, c: project_planes(
            c["view_proj"], c["cam_pos"], s["px"], s["py"], s["pz"],
            s["radius"], rcfg,
        )
    )(splats, camera)
    r_cap = rcfg.r_cap
    r_raw = np.asarray(proj["radius_raw"])
    clamp_frac = float((r_raw > r_cap).mean())
    r_raw_max = float(r_raw.max())

    # isolated sorts (the stage the reference's RadixSorter owns): the
    # record-rank sort at N plus the (tile, rank) pair sort at N*cap with the
    # 2-word payload — exactly bin_splats_packed's sort structure
    from splat_renderer_tpu.render.packing import depth_bits, pack_records

    cap = rcfg.tiles_per_splat_cap

    def pair_sort(d):
        dk = depth_bits(d[:, 7])
        w0, w1, w2 = pack_records(d, rcfg)
        iota = jax.lax.broadcasted_iota(jnp.int32, (N_SPLATS, 1), 0)[:, 0]
        _, _, w0, w1, w2 = jax.lax.sort(
            (dk, iota, w0, w1, w2), num_keys=2, is_stable=False
        )
        tile = jnp.zeros((cap * N_SPLATS,), jnp.int32)

        def bc(x):
            return jnp.broadcast_to(x[None, :], (cap, N_SPLATS)).reshape(-1)

        return jax.lax.sort(
            (tile, bc(iota), bc(w0), bc(w2)), num_keys=2, is_stable=False
        )[2]

    t_sort, _ = time_fn(jax.jit(pair_sort), data, warmup=2, iters=5)

    bin_j = jax.jit(lambda d: bin_splats_packed(d, rcfg, BLOCK))
    t_bin, binned = time_fn(bin_j, data, warmup=2, iters=5)
    blocks_used = int(np.asarray(binned["block_off"])[-1])
    mb = max(1024, -(-int(blocks_used * 1.25) // 1024) * 1024)

    blend_j = jax.jit(
        lambda d, b: render_tiles_pallas(d, b, rcfg, block=BLOCK, max_blocks=mb)
    )
    t_blend, img = time_fn(blend_j, data, binned, warmup=2, iters=5)

    # ---- full fused frame (render-only: splats -> image) ----
    # headline kernel: tile-major (grid-per-nonempty-tile); class in tiles
    mt = int(np.asarray(binned["tiles_used"]) * 1.15) + 8

    def full(s, c):
        return render_splats(s, c, rcfg, "pallas", BLOCK, blend_max_blocks=mt,
                             blend_kernel="tile")

    full_j = jax.jit(full)
    t_full, img_exact = time_fn(full_j, splats, camera, warmup=2, iters=5)

    def full_flat(s, c):
        return render_splats(s, c, rcfg, "pallas", BLOCK, blend_max_blocks=mb)

    t_flat, _ = time_fn(jax.jit(full_flat), splats, camera, warmup=2, iters=5)

    # ---- SH-lit frame (render/sh.py): degree-3 view-dependent color at
    # 1M — what rendering a pre-trained 3DGS scene's appearance costs ----
    from splat_renderer_tpu.render.sh import apply_sh

    sh_rng = np.random.default_rng(5)
    sh = {c: jnp.asarray(sh_rng.normal(scale=0.1, size=(15, N_SPLATS))
                         .astype(np.float32)) for c in ("r", "g", "b")}

    def full_sh(s, sh_, c):
        return render_splats(apply_sh(s, sh_, c["cam_pos"]), c, rcfg,
                             "pallas", BLOCK, blend_max_blocks=mt,
                             blend_kernel="tile")

    t_sh, _ = time_fn(jax.jit(full_sh), splats, sh, camera, warmup=2, iters=5)

    # ---- fast profile (cfg.fast_math): coarse-rank fused pair sort
    # (sub-quantization order deviation; opt-in, see config.py) ----
    rcfg_fast = rcfg.replace(fast_math=True)

    def full_fast(s, c):
        return render_splats(s, c, rcfg_fast, "pallas", BLOCK,
                             blend_max_blocks=mt, blend_kernel="tile")

    t_fast, _ = time_fn(jax.jit(full_fast), splats, camera, warmup=2, iters=5)

    # ---- turbo profile (config.turbo_render_config): fast_math + support
    # cut at 1.3r — documented approximation preset; SSIM vs the exact frame
    # is reported alongside so the trade is always visible ----
    rcfg_turbo = spt.turbo_render_config(
        WIDTH, HEIGHT, base_radius=0.008, tiles_per_splat_cap=4
    )
    data_turbo = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg_turbo))(
        splats, camera
    )
    binned_turbo = jax.jit(lambda d: bin_splats_packed(d, rcfg_turbo, BLOCK))(
        data_turbo
    )
    mt_turbo = int(np.asarray(binned_turbo["tiles_used"]) * 1.15) + 8

    def full_turbo(s, c):
        return render_splats(s, c, rcfg_turbo, "pallas", BLOCK,
                             blend_max_blocks=mt_turbo, blend_kernel="tile")

    t_turbo, img_turbo = time_fn(jax.jit(full_turbo), splats, camera,
                                 warmup=2, iters=5)
    from splat_renderer_tpu.utils.ssim import ssim

    ssim_turbo = float(jax.jit(ssim)(img_turbo, img_exact))

    # ---- config 1: oracle, 10k splats @256x256 ----
    ocfg = RenderConfig(width=256, height=256, base_radius=0.03)
    from splat_renderer_tpu.render.oracle import render_oracle

    o_splats = jax.jit(lambda p, k: model_points(scene, p, k, 10_000, pcfg, ocfg))(
        params, key
    )
    ocam = {k_: jnp.asarray(v) for k_, v in spt.Camera(aspect=1.0).arrays().items()}
    t_oracle, _ = time_fn(
        jax.jit(lambda s, c: render_oracle(splat_screen_data(s, c, ocfg), ocfg)),
        o_splats, ocam, warmup=1, iters=3,
    )

    # ---- config 2: tile pipeline small, 100k @720p ----
    cfg720 = RenderConfig(width=1280, height=720, base_radius=0.02,
                          tiles_per_splat_cap=4)
    s100k = jax.jit(lambda p, k: model_points(scene, p, k, 100_000, pcfg, cfg720))(
        params, key
    )
    cam720 = {k_: jnp.asarray(v) for k_, v in
              spt.Camera(aspect=1280 / 720).arrays().items()}
    d720 = jax.jit(lambda s, c: splat_screen_data(s, c, cfg720))(s100k, cam720)
    mb720 = _capacity_class(d720, cfg720)
    t_720, _ = time_fn(
        jax.jit(lambda s, c: render_tiles_pallas(
            splat_screen_data(s, c, cfg720), None, cfg720, block=BLOCK,
            max_blocks=mb720)),
        s100k, cam720, warmup=2, iters=5,
    )

    # ---- config 4: 500k animated over 120 frames (incl. host loop) ----
    d500 = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(
        jax.jit(lambda p, k: model_points(scene, p, k, 500_000, pcfg, rcfg))(
            params, key
        ),
        camera,
    )
    mb500 = _capacity_class(d500, rcfg)

    def animated(p, c, k):
        s = model_points(scene, p, k, 500_000, pcfg, rcfg)
        d = splat_screen_data(s, c, rcfg)
        return render_tiles_pallas(d, None, rcfg, block=BLOCK, max_blocks=mb500)

    anim_j = jax.jit(animated)
    t_anim, _ = time_fn(anim_j, params, camera, key, warmup=2, iters=5)

    # the honest 120-frame sequence: animate primitive params + orbit the
    # camera every frame, host loop included (BASELINE config 4 verbatim)
    acam = spt.Camera(aspect=WIDTH / HEIGHT)
    out = None
    t0 = time.perf_counter()
    for i in range(120):
        t = i / 60.0
        scene["sphere2"].position[1] = 0.6 + 0.2 * np.sin(2 * np.pi * t)
        acam.azimuth = 0.5 + 0.02 * i
        c_i = {k_: jnp.asarray(v) for k_, v in acam.arrays(t).items()}
        out = anim_j(scene.params(), c_i, jax.random.fold_in(key, i))
    jax.device_get(out.ravel()[:1])
    t_seq = time.perf_counter() - t0
    scene["sphere2"].position[1] = 0.6  # restore

    # ...and the fused form: all 120 frames in ONE lax.scan program
    # (render/sequence.py) — the TPU datagen mode, zero host round trips
    from splat_renderer_tpu.render.sequence import render_sequence

    acam2 = spt.Camera(aspect=WIDTH / HEIGHT)
    cam_list, par_list = [], []
    for i in range(120):
        t = i / 60.0
        scene["sphere2"].position[1] = 0.6 + 0.2 * np.sin(2 * np.pi * t)
        acam2.azimuth = 0.5 + 0.02 * i
        cam_list.append({k_: jnp.asarray(v) for k_, v in acam2.arrays(t).items()})
        par_list.append(scene.params())
    scene["sphere2"].position[1] = 0.6
    cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cam_list)
    par_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *par_list)
    seq_j = jax.jit(
        lambda p, c, k: render_sequence(
            scene, p, c, k, 500_000, pcfg, rcfg, "pallas",
            blend_max_blocks=mb500,
        )
    )
    t_scan, _ = time_fn(seq_j, par_stack, cam_stack, key, warmup=1, iters=2)

    # ---- config 5: 8 views x 2M splats @1080p, one fused program ----
    from splat_renderer_tpu.render import render_views

    s2m = jax.jit(lambda p, k: model_points(scene, p, k, 2_000_000, pcfg, rcfg))(
        params, key
    )
    cams8 = {k_: jnp.asarray(v) for k_, v in
             spt.orbit_ring(8, aspect=WIDTH / HEIGHT).items()}
    d2m = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(s2m, camera)
    mb2m = _capacity_class(d2m, rcfg)
    mv_j = jax.jit(
        lambda s, c: render_views(s, c, rcfg, "pallas", BLOCK, blend_max_blocks=mb2m, flat=True)
    )
    t_mv, _ = time_fn(mv_j, s2m, cams8, warmup=1, iters=3)

    # ---- the reference's LIVE path: opaque oriented surface @1M ----
    scfg = spt.surface_render_config(
        WIDTH, HEIGHT, base_radius=0.004, tiles_per_splat_cap=4
    )
    dsurf = jax.jit(lambda s, c: splat_screen_data(s, c, scfg))(
        jax.jit(lambda p, k: model_points(scene, p, k, N_SPLATS, pcfg, scfg))(
            params, key
        ),
        camera,
    )
    mbs = _capacity_class(dsurf, scfg)

    def surface(p, c, k):
        s = model_points(scene, p, k, N_SPLATS, pcfg, scfg)
        d = splat_screen_data(s, c, scfg)
        return render_tiles_pallas(d, None, scfg, block=BLOCK, max_blocks=mbs)

    surf_j = jax.jit(surface)
    t_surf, _ = time_fn(surf_j, params, camera, key, warmup=2, iters=5)

    # ---- inverse rendering: one fit step (value_and_grad through the
    # custom-VJP Pallas diff path, render/diff.py method="pallas") at
    # 200k @512^2 — the training-speed metric; guarded so a diff-path
    # regression can never take the whole bench down ----
    t_fit = None
    try:
        from splat_renderer_tpu.render import render_diff

        fcfg = RenderConfig(width=512, height=512, base_radius=0.008,
                            tiles_per_splat_cap=4)
        fs = jax.jit(lambda p, k: model_points(scene, p, k, 200_000, pcfg, fcfg))(
            params, key
        )
        fcam = {k_: jnp.asarray(v) for k_, v in
                spt.Camera(aspect=1.0).arrays().items()}
        ftarget = jax.jit(
            lambda s: render_diff(s, fcam, fcfg, method="pallas")
        )(fs)
        ftheta = {k_: jnp.full_like(fs[k_], 0.5)
                  for k_ in ("cr", "cg", "cb", "opacity")}

        @jax.jit
        def fit_step(theta, s, target):
            def loss(t):
                img = render_diff(dict(s, **t), fcam, fcfg, method="pallas")
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(theta)

        t_fit, _ = time_fn(fit_step, ftheta, fs, ftarget, warmup=1, iters=3)
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"# fit-step metric skipped: {type(e).__name__}: {e}")

    # fixed per-dispatch launch overhead of this transport (a trivial jit):
    # all single-dispatch numbers above include it additively; the scan/
    # multi-view sequence metrics amortize it (utils/timing.py caveat)
    t_disp, _ = time_fn(
        jax.jit(lambda v: v + 1.0), jnp.ones((8, 128)), warmup=3, iters=20
    )

    fps = 1.0 / t_full
    result = {
        "metric": "fps_1080p_1m_splats",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
        "msplats_per_sec": round(N_SPLATS * fps / 1e6, 2),
        "frame_ms": round(t_full * 1e3, 3),
        "frame_ms_flat_kernel": round(t_flat * 1e3, 3),
        "frame_ms_sh_deg3": round(t_sh * 1e3, 3),
        "frame_ms_fast": round(t_fast * 1e3, 3),
        "fps_fast": round(1.0 / t_fast, 2),
        "frame_ms_turbo": round(t_turbo * 1e3, 3),
        "fps_turbo": round(1.0 / t_turbo, 2),
        "ssim_turbo_vs_exact": round(ssim_turbo, 5),
        "project_ms": round(t_project * 1e3, 3),
        "sort_ms": round(t_sort * 1e3, 3),
        "bin_ms": round(t_bin * 1e3, 3),
        "blend_ms": round(t_blend * 1e3, 3),
        "model_stage_ms": round(t_model * 1e3, 3),
        "oracle_10k_256_ms": round(t_oracle * 1e3, 3),
        "frame_720p_100k_ms": round(t_720 * 1e3, 3),
        "animated_frame_ms_500k": round(t_anim * 1e3, 3),
        "animated_120f_s": round(t_seq, 3),
        "animated_120f_fps": round(120.0 / t_seq, 2),
        "animated_120f_scan_s": round(t_scan, 3),
        "animated_120f_scan_fps": round(120.0 / t_scan, 2),
        "multiview8_2m_ms": round(t_mv * 1e3, 3),
        "surface_opaque_frame_ms_1m": round(t_surf * 1e3, 3),
        "blend_blocks_used": blocks_used,
        "blend_capacity_class": mb,
        "radius_clamped_frac": round(clamp_frac, 5),
        "radius_raw_max_px": round(r_raw_max, 2),
        "fit_step_200k_512_ms": (
            round(t_fit * 1e3, 3) if t_fit is not None else None
        ),
        "dispatch_overhead_ms": round(t_disp * 1e3, 3),
        "n_splats": N_SPLATS,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
