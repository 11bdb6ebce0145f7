"""Probe: jitted fit-step (value_and_grad) cost of render/diff.py on the
real chip, across scales and methods.

methods (CLI args; default both):
- tiles:  XLA scan compositor; autodiff backward.  Measured v5e: 10k@256
  fit step 47.8 ms, 50k@512 127.7 ms — the scan is ~8-10x the Pallas
  forward and the backward doubles it.
- pallas: the custom-VJP kernel pair (ops/tile_blend_diff.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_fit.py \
         [tiles] [pallas]
"""

import sys
import time

import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render import render_diff
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.utils.timing import time_fn


def run_one(n, size, cap, cfg, camera, splats, method):
    target = render_diff(splats, camera, cfg, method=method)
    theta = {k: jnp.full_like(splats[k], 0.5)
             for k in ("cr", "cg", "cb", "opacity")}

    @jax.jit
    def step(theta, splats, target):
        def loss(t):
            img = render_diff(dict(splats, **t), camera, cfg, method=method)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(loss)(theta)

    fwd = jax.jit(
        lambda t, s: render_diff(dict(s, **t), camera, cfg, method=method)
    )

    t0 = time.perf_counter()
    l, _ = step(theta, splats, target)
    compile_s = time.perf_counter() - t0
    sec, _ = time_fn(step, theta, splats, target, iters=5)
    fsec, _ = time_fn(fwd, theta, splats, iters=5)
    print(f"n={n:>7} {size}x{size} cap={cap} {method:6s}: "
          f"fit step {sec * 1e3:8.1f} ms"
          f"  (fwd-only diff {fsec * 1e3:7.1f} ms, compile {compile_s:.0f}"
          f" s, loss {float(l):.4f})")


def main():
    scene = spt.SDFScene(
        spt.smooth_union(
            0.15,
            spt.Sphere(id="s1", radius=0.5),
            spt.Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
        )
    )
    methods = sys.argv[1:] or ["tiles", "pallas"]
    for n, size, cap in ((10_000, 256, 16), (50_000, 512, 8),
                         (200_000, 512, 4), (500_000, 1024, 4)):
        cfg = RenderConfig(width=size, height=size, base_radius=0.05,
                           tiles_per_splat_cap=cap)
        cam = spt.Camera(azimuth=0.5, elevation=0.3, aspect=1.0)
        camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        splats = model_points(scene, scene.params(), jax.random.PRNGKey(0),
                              n, PointConfig(), cfg)
        for method in methods:
            run_one(n, size, cap, cfg, camera, splats, method)


if __name__ == "__main__":
    main()
