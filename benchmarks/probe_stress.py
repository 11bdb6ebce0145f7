"""Scale stress: exact fused frame at 2M/4M/10M splats @1080p on one chip.

The reference's planning stretch target is "10M points @ 30+ FPS" on a
WebGPU-class GPU (/root/reference/3D_PLAN.md:379-382) — never demonstrated
there (no benchmarks exist).  This probe measures what ONE v5e chip actually
does at those scales with exact compositing, and that the pipeline stays
finite/correct (no capacity overflow, no OOM) as N grows 10x past the
headline config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_stress.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    model_points,
    render_splats,
    splat_screen_data,
)
from splat_renderer_tpu.utils.timing import time_fn

WIDTH, HEIGHT = 1920, 1080
BLOCK = 1024


def main():
    scene = spt.SDFScene(
        spt.smooth_union(
            0.15,
            spt.Sphere(id="s1", radius=0.5),
            spt.Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
        )
    )
    cam = spt.Camera(aspect=WIDTH / HEIGHT)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params = scene.params()
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")

    for n in (2_000_000, 4_000_000, 10_000_000):
        # keep world splat size scaling ~1/sqrt(N) so the scene stays a
        # surface at constant overdraw — the physically sensible regime
        base_r = 0.008 * float(np.sqrt(1e6 / n))
        rcfg = RenderConfig(width=WIDTH, height=HEIGHT, base_radius=base_r,
                            tiles_per_splat_cap=4)
        splats = jax.jit(
            lambda p, k, n=n, rcfg=rcfg: model_points(
                scene, p, k, n, PointConfig(descent_steps=5), rcfg
            )
        )(params, key)
        data = jax.jit(
            lambda s, c, rcfg=rcfg: splat_screen_data(s, c, rcfg)
        )(splats, camera)
        binned = jax.jit(
            lambda d, rcfg=rcfg: bin_splats_packed(d, rcfg, BLOCK)
        )(data)
        used = int(np.asarray(binned["block_off"])[-1])
        mt = int(np.asarray(binned["tiles_used"]) * 1.15) + 8

        def full(s, c, rcfg=rcfg, mt=mt):
            return render_splats(s, c, rcfg, "pallas", BLOCK,
                                 blend_max_blocks=mt, blend_kernel="tile")

        t, img = time_fn(jax.jit(full), splats, camera, warmup=2, iters=3)
        finite = bool(np.isfinite(np.asarray(img)).all())
        print(
            f"n={n:>9,}  frame {t * 1e3:8.1f} ms  ({1.0 / t:5.2f} FPS, "
            f"{n / t / 1e6:7.1f} Msplats/s)  windows={used}  "
            f"finite={finite}"
        )


if __name__ == "__main__":
    main()
