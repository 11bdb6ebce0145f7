"""Projection-stage probe at 1M splats (plane SoA path).

History: the round-2 AoS path cost 3.7 ms, of which 3.06 ms was just
extracting three columns from the (1M, 3) position array — (N, small)
arrays are lane-padded toward the 128-lane tile on TPU, so every touch
moves ~40x the useful bytes.  The plane Splats layout (points/properties.py)
removed every (N, 3) intermediate from the render path.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_project.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.render.projector import splat_screen_words
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
rcfg = RenderConfig(width=1920, height=1080, base_radius=0.008,
                    tiles_per_splat_cap=4)


def main():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    cam = spt.Camera(aspect=1920 / 1080)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, PointConfig(), rcfg)
    )(scene.params(), jax.random.PRNGKey(0))

    t, _ = time_fn(
        jax.jit(lambda s, c: splat_screen_words(s, c["view_proj"],
                                                c["cam_pos"], rcfg)),
        splats, camera, warmup=2, iters=10)
    print(f"plane words path       : {t*1e3:7.3f} ms")

    # the historical (N, 3) tax, for the record: three column extractions
    pos3 = jnp.stack([splats["px"], splats["py"], splats["pz"]], axis=-1)
    pos3 = jax.block_until_ready(pos3)

    def cols(p3):
        return tuple(p3[:, k] + 0.0 for k in range(3))

    t, _ = time_fn(jax.jit(cols), pos3, warmup=2, iters=10)
    print(f"(N,3) column slices    : {t*1e3:7.3f} ms   <- the old layout's tax")


if __name__ == "__main__":
    main()
