"""Projection-stage floor probe: what does project+shade+quantize+pack
actually cost on device, and how far from the memory bound is it?

Times splat_screen_words (the SoA fast path feeding the Pallas frame) in
three ways at 1M splats @1080p:
  1. isolated jit (carries the ~1.5-2.8 ms relay dispatch overhead),
  2. scan-amortized (x16 inside one program — true per-pass device cost),
  3. a pure HBM roundtrip of the same byte volume (11 f32 planes in,
     4 u32 + 1 f32 planes out) as the speed-of-light reference.

Decides VERDICT item 7 (fused Pallas projection kernel): if (2) is already
near (3), XLA has fused the chain and a Pallas kernel buys nothing.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_project3.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.render.projector import splat_screen_words
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000


def main():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2)
    )
    cam = spt.Camera(aspect=1920 / 1080)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}

    for tag, cfg in (
        ("isotropic", RenderConfig(width=1920, height=1080,
                                   tiles_per_splat_cap=4)),
        ("ewa", RenderConfig(width=1920, height=1080, tiles_per_splat_cap=4,
                             oriented=True, ellipse="ewa")),
    ):
        splats = jax.jit(
            lambda p, k: model_points(scene, p, k, N, PointConfig(), cfg)
        )(scene.params(), jax.random.PRNGKey(0))

        def words(s, c, cfg=cfg):
            return splat_screen_words(s, c["view_proj"], c["cam_pos"], cfg)

        t1, _ = time_fn(jax.jit(words), splats, camera, warmup=3, iters=20)

        def words_scan(s, c, cfg=cfg):
            # 16 passes in one program; vary cam_pos so XLA cannot CSE them
            def step(carry, i):
                cc = dict(c, cam_pos=c["cam_pos"] + 1e-6 * i)
                w = splat_screen_words(s, cc["view_proj"], cc["cam_pos"], cfg)
                return carry + w["dk"][0].astype(jnp.uint32), None

            acc, _ = jax.lax.scan(
                step, jnp.uint32(0), jnp.arange(16, dtype=jnp.float32)
            )
            return acc

        t2, _ = time_fn(jax.jit(words_scan), splats, camera, warmup=2, iters=5)

        # speed-of-light: same bytes through HBM, trivial compute
        planes = [splats[k] for k in
                  ("px", "py", "pz", "radius", "opacity", "cr", "cg", "cb",
                   "nx", "ny", "nz")]

        def roundtrip(ps):
            s = ps[0]
            for p in ps[1:]:
                s = s + p
            u = s.astype(jnp.int32).astype(jnp.uint32)
            return {"a": u, "b": u ^ 1, "c": u ^ 2, "d": u ^ 3, "e": s}

        t3, _ = time_fn(jax.jit(roundtrip), planes, warmup=3, iters=20)
        print(f"{tag:10}: isolated {t1 * 1e3:6.2f} ms | scan-true "
              f"{t2 * 1e3 / 16:6.3f} ms/pass | HBM floor {t3 * 1e3:6.3f} ms")


if __name__ == "__main__":
    main()
