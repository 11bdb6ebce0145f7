"""Probe: fused 1M @1080p frame with vs without class-partitioned expansion.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_class_frame.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.pipeline import model_points, render_splats
from splat_renderer_tpu.render.pipeline import _class_caps
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
CFG = RenderConfig(width=1920, height=1080, base_radius=0.008, tiles_per_splat_cap=4)


def _scene():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    return spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))


def main():
    cfg = CFG
    scene = _scene()
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params = scene.params()
    key = jax.random.PRNGKey(0)

    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, PointConfig(descent_steps=5), cfg)
    )(params, key)
    splats = jax.tree.map(lambda x: x.block_until_ready(), splats)

    # census + steady blend class from a safe-bound run
    img, stats = jax.jit(
        lambda s, c: render_splats(
            s, c, cfg, "pallas", return_stats=True, blend_kernel="tile"
        )
    )(splats, camera)
    n_hi, n_mid = (int(x) for x in np.asarray(stats["class_counts"]))
    used = int(stats["blocks_used"])
    mt = max(1024, -(-int(used * 1.25) // 1024) * 1024)
    cc = _class_caps(n_hi, n_mid, N, cfg.tiles_per_splat_cap)
    print(f"census: n_hi={n_hi} n_mid={n_mid} of {N}; tiles_used={used} -> "
          f"class {mt}; class_caps={cc}")
    if cc is not None:
        p_class = cfg.tiles_per_splat_cap * cc[0] + 2 * cc[1] + (N - cc[0] - cc[1])
        print(f"pair slots: {N * cfg.tiles_per_splat_cap} -> {p_class}")

    legs = [("no-class", None)]
    if cc is not None:
        legs.append(("class", cc))
    else:
        print("class_caps heuristic rejected the partition at this census; "
              "skipping the (identical) class leg")
    for tag, caps in legs:
        fn = jax.jit(
            lambda s, c, caps=caps: render_splats(
                s, c, cfg, "pallas", blend_max_blocks=mt,
                blend_kernel="tile", pair_class_caps=caps,
            )
        )
        t, img2 = time_fn(fn, splats, camera, warmup=2, iters=10)
        print(f"fused frame [{tag:9s}]: {t*1e3:7.2f} ms  ({1.0/t:5.1f} FPS)")


if __name__ == "__main__":
    main()
