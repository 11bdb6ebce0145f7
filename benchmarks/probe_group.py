"""A/B: blend prefix-group size 128 vs 256 in the fused 1M@1080p frame,
plus the G-buffer (depth-carrying stream) frame cost.

Motivation (VERDICT r4 item 2 / NOTES round-3 blend model): the blend panel
runs at ~1.1-1.2 ns/pair-px with a ~0.2 us fixed cost per 128-record group
(scalar predicate + panel lead-in, probe_blend_iso.py).  At the 32x16
headline (~2.45M class-capped pair records -> ~19k groups) that fixed cost
is ~3.8 ms of the 12.1 ms blend stage.  group=256 halves the group count
for +1 Hillis-Steele doubling step (8 vs 7) and one sublane concat per
plane; output stays exact (ulp-level FP reassociation only, gated in
tests).  This probe measures the real trade in-process, interleaved —
cross-run A/B over the relay is unresolvable weather (CLAUDE.md).

G-buffer leg (VERDICT r3 item 3's done criterion): the depth-carrying
stream (binning with_depth, one extra u32 lane section + 4th MXU channel)
must land within ~1.2x of the color-only frame.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_group.py
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
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    _class_caps,
    model_points,
    render_gbuffer,
    render_splats,
    splat_screen_data,
)
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

    def full(s, c, cc, group):
        return render_splats(s, c, rcfg, "pallas", BLOCK,
                             blend_max_blocks=mt, blend_kernel="tile",
                             pair_class_caps=cc, blend_group=group,
                             return_stats=True)

    _, stats = jax.jit(lambda s, c: full(s, c, None, 128))(splats, camera)
    n_hi, n_mid = (int(x) for x in np.asarray(stats["class_counts"]))
    cc = _class_caps(n_hi, n_mid, N, rcfg.tiles_per_splat_cap)
    print(f"class caps: {cc}", file=sys.stderr)

    fns = {g: jax.jit(lambda s, c, g=g: full(s, c, cc, g)[0])
           for g in (128, 256, 512)}
    imgs = {}
    for g, f in fns.items():  # compile + correctness capture
        imgs[g] = np.asarray(jax.device_get(f(splats, camera)))
    for g in (256, 512):
        # default-eps drift comes from coarser saturation checkpoints
        # (bounded by a few x transmittance_eps; the eps=0 BIT-equality
        # gate lives in drive_tpu_parity.check_blend_group + the interpret
        # test) — report it, bound it loosely
        d = float(np.abs(imgs[g] - imgs[128]).max())
        print(f"max|g{g} - g128| = {d:.2e} (sat-skip granularity)",
              file=sys.stderr)
        assert d < 5 * rcfg.transmittance_eps, d

    # interleaved A/B bursts: both variants see the same relay weather
    results = {g: [] for g in fns}
    for burst in range(5):
        for g, f in fns.items():
            t, _ = time_fn(f, splats, camera, warmup=1, iters=5)
            results[g].append(t * 1e3)
    for g, ts in results.items():
        print(f"group={g}: bursts {['%.2f' % t for t in ts]} "
              f"min {min(ts):.3f} ms")

    # ---- G-buffer frame (exact kernel + depth stream) ----
    def gb(s, c):
        return render_gbuffer(s, c, rcfg, method="pallas",
                              blend_max_blocks=mt)["depth"]

    def color_only(s, c):
        return render_splats(s, c, rcfg, "pallas", BLOCK,
                             blend_max_blocks=mt, blend_kernel="tile")

    gb_j, col_j = jax.jit(gb), jax.jit(color_only)
    d_img = np.asarray(jax.device_get(gb_j(splats, camera)))
    assert np.isfinite(d_img).all()
    print(f"gbuffer depth range: {d_img[d_img > 0].min():.3f}.."
          f"{d_img.max():.3f}", file=sys.stderr)
    tg = tc = []
    tg_l, tc_l = [], []
    for burst in range(3):
        t, _ = time_fn(gb_j, splats, camera, warmup=1, iters=5)
        tg_l.append(t * 1e3)
        t, _ = time_fn(col_j, splats, camera, warmup=1, iters=5)
        tc_l.append(t * 1e3)
    print(f"gbuffer frame: min {min(tg_l):.3f} ms  "
          f"color-only: min {min(tc_l):.3f} ms  "
          f"ratio {min(tg_l) / min(tc_l):.3f}")


if __name__ == "__main__":
    main()
