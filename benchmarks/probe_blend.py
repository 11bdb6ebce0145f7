"""Blend-kernel perf probe (round 2, second half) at the bench shape.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_blend.py

Measures, for the 2-word stream at 1M@1080p/cap=4:
  - pair/run statistics (active pairs, nonempty tiles, live groups)
  - bin sub-stages (record sort, pair sort, the rest)
  - blend at block 1024/2048/4096 x eps {0, default, inf}
    (eps=inf skips every window -> pure per-grid-step overhead)
  - saturation-check granularity: per-group (current) vs per-window
    (the per-group (1,1) max reduce costs ~0.1 us each — NOTES.md)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_packed_words
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

    words = jax.jit(
        lambda s, c: splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)
    )(splats, camera)

    # ---- bin sub-stages ----
    def recsort(w):
        n = w["dk"].shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        return jax.lax.sort(
            (w["dk"], iota, w["w_pos"], w["w_ro"], w["w_rgb"]),
            num_keys=2, is_stable=False,
        )[2]

    t_rec, _ = time_fn(jax.jit(recsort), words, warmup=2, iters=10)
    print(f"record sort @1M (nk2, 3 payload): {t_rec*1e3:7.2f} ms")

    for block in (1024, 2048, 4096):
        bin_j = jax.jit(lambda w: bin_packed_words(
            w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"], rcfg, block))
        t_bin, binned = time_fn(bin_j, words, warmup=2, iters=5)
        counts = np.asarray(binned["counts"])
        used = int(np.asarray(binned["block_off"])[-1])
        mb = int(used * 1.25) + 8
        if block == 1024:
            print(f"active_pairs={counts.sum()} nonempty_tiles={(counts>0).sum()} "
                  f"groups128={int(np.ceil(counts/128).sum())} "
                  f"count_p50={np.percentile(counts[counts>0],50):.0f} "
                  f"p99={np.percentile(counts[counts>0],99):.0f} "
                  f"max={counts.max()}")
        print(f"block={block}: bin={t_bin*1e3:7.2f} ms  blocks_used={used}")
        for eps, name in ((0.0, "eps=0"), (-1.0, "eps=dflt"), (np.inf, "eps=inf")):
            blend_j = jax.jit(lambda b, e=eps: render_tiles_pallas(
                None, b, rcfg, block=block, eps=float(e), max_blocks=mb))
            t_bl, _ = time_fn(blend_j, binned, warmup=2, iters=5)
            print(f"  blend block={block} {name:8}: {t_bl*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
