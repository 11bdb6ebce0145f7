"""A/B: blend window size (block) 1024 vs 2048 at the r05 headline
config (32x16 + class caps + group=256) — VERDICT r4 item 1(b).

Round-2 measured block 2048/4096 LOSING at ts32 with group=128
(lead-in waste + coarser whole-window saturation).  The group predicate
now skips lead-in/tail at 256-record granularity inside the window, so
the old loss mechanism is mostly gone; the win would be ~half the
per-window Mosaic/DMA overhead.  Re-measure in-process interleaved.

Also sweeps group=512 at block=2048 (the window fits 8 groups; maybe the
bigger window likes coarser predicates).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_block_r5.py
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
    render_splats,
    splat_screen_data,
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

    b32 = jax.jit(lambda s, c: bin_splats_packed(
        splat_screen_data(s, c, rcfg), rcfg, 1024))(splats, camera)
    mt = int(np.asarray(b32["tiles_used"]) * 1.15) + 8
    n_hi, n_mid = (int(x) for x in np.asarray(b32["class_counts"]))
    cc = _class_caps(n_hi, n_mid, N, rcfg.tiles_per_splat_cap)
    print(f"caps {cc} tiles~{mt}", file=sys.stderr)

    def full(s, c, block, group):
        return render_splats(s, c, rcfg, "pallas", block,
                             blend_max_blocks=mt, blend_kernel="tile",
                             pair_class_caps=cc, blend_group=group)

    variants = [("b1024 g256", (1024, 256)),
                ("b2048 g256", (2048, 256)),
                ("b2048 g512", (2048, 512))]
    fns = []
    for name, (blk, grp) in variants:
        f = jax.jit(lambda s_, c_, b=blk, g=grp: full(s_, c_, b, g))
        jax.device_get(f(splats, camera).ravel()[:1])
        print(f"compiled {name}", file=sys.stderr)
        fns.append((name, f))

    # parity first: block is pipeline-internal, images must be identical
    imgs = [np.asarray(jax.device_get(f(splats, camera))) for _, f in fns]
    for (name, _), img in zip(fns[1:], imgs[1:]):
        d = float(np.abs(img - imgs[0]).max())
        print(f"parity {name} vs b1024: maxdiff {d:.2e}", file=sys.stderr)

    results = {name: [] for name, _ in fns}
    for burst in range(5):
        for name, f in fns:
            t, _ = time_fn(f, splats, camera, warmup=1, iters=5)
            results[name].append(t * 1e3)
    for name, ts in results.items():
        print(f"{name}: bursts {['%.2f' % t for t in ts]}  "
              f"min {min(ts):.3f} ms")


if __name__ == "__main__":
    main()
