"""depth_key_order probe: is skipping the record sort worth it e2e?

Times the fused 1M @1080p turbo frame with the canonical rank pair key
(record sort + fused/nk2 pair sort) vs the depth-key pair key (no record
sort at all), and reports the image deviation the coarser ordering costs
(SSIM / max|diff| vs the rank-ordered turbo frame).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_depth_order.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, turbo_render_config
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_packed_words
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.render.projector import splat_screen_words
from splat_renderer_tpu.utils.ssim import ssim
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
BLOCK = 1024


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
        ("turbo/rank", turbo_render_config(depth_key_order=False)),
        ("turbo/depthkey", turbo_render_config()),
    ):
        cfgp = cfg.replace(tiles_per_splat_cap=4)
        splats = jax.jit(
            lambda p, k: model_points(scene, p, k, N, PointConfig(), cfgp)
        )(scene.params(), jax.random.PRNGKey(0))

        def frame(s, c, cfgp=cfgp):
            w = splat_screen_words(s, c["view_proj"], c["cam_pos"], cfgp)
            binned = bin_packed_words(
                w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"], cfgp, BLOCK
            )
            img, st = render_tiles_pallas(
                None, binned, cfgp, block=BLOCK, max_blocks=5120,
                return_stats=True,
            )
            return img

        t, img = time_fn(jax.jit(frame), splats, camera, warmup=3, iters=10)
        print(f"{tag:16}: {t * 1e3:7.2f} ms  ({1.0 / t:5.1f} FPS)")
        if tag == "turbo/rank":
            ref = np.asarray(img)
        else:
            got = np.asarray(img)
            s = float(ssim(jnp.asarray(ref), jnp.asarray(got)))
            print(f"{'deviation':16}: ssim={s:.5f}  maxdiff="
                  f"{np.abs(ref - got).max():.4f}  "
                  f"meandiff={np.abs(ref - got).mean():.2e}")


if __name__ == "__main__":
    main()
