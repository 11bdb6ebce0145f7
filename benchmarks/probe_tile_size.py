"""Tile-size sweep at the bench config (1M splats @1080p, v5e).

The one untried structural lever against the pair-sort/bin wall
(VERDICT.md round 2, item 2): at radius_raw_max ~4.7 px, 42% of footprints
straddle 2x2 tiles of 16 px.  Larger tiles collapse straddles (the
class-partitioned expansion then shrinks the pair sort toward N), quarter
the tile count and shorten the fused key's tile bits — at the price of
more blend pixels per record (tp 256 -> 1024 at 32 px: every record's
alpha panel covers 4x the pixels).  This probe measures the whole trade,
per stage and fused, including the Engine's class-caps protocol at each
tile size, and checks exact-profile images stay bit-identical across tile
sizes (the canonical rank order makes them so by construction).

Run:  python benchmarks/probe_tile_size.py [--sizes 16,24,32] [--n 1000000]

MEASURED (v5e, 1M @1080p, bench scene, round 3 — two runs, relay ~±1 ms):

  ts   bin_ms  census>2/==2      cc pair rows     exact    exact+cc  fast+cc  turbo
  16   22.5    418k/858k         off (1.00x)      30.8     —         —        26.1
  24   19.0    185k/659k         2.29M (0.57x)    29.6     27.2      26.4     27.6
  32   17.1    101k/532k         1.92M (0.48x)    30.8-31  26.4-27.1 26.4-27  28.4-29.3

Conclusions (adopted in bench.py):
- 32 px tiles collapse the straddle census (86% of splats touch >= 2 tiles
  at 16 px; 48% at 32 px), activating the class partition: pair rows halve
  and the EXACT fused frame drops ~4 ms (30.8 -> ~26.7), image
  bit-identical to the same-ts full-cap expansion (max_dev = 0).
- plain ts=32 without class caps gains nothing: the bin win is eaten by the
  blend's 4x pixels/record (tp 256 -> 1024).
- turbo (depth_key_order) CANNOT compose with class caps (no ranks) and
  loses from the bigger blend at 32 px — it stays on 16 px tiles.
- across tile sizes the image differs by <= 8.4e-3 max pixel: r_cap scales
  with ts, so the r:10 fixed-point grid coarsens (quantization semantics,
  not error; each ts self-gates against its own oracle).
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    _class_caps, model_points, render_splats, splat_screen_data,
)
from splat_renderer_tpu.utils.timing import time_fn

W, H, BLOCK = 1920, 1080, 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,32")
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    def parse(tok):  # "32" -> (32, 32) square; "32x16" -> (w=32, h=16)
        if "x" in tok:
            w_, h_ = tok.split("x")
            return int(w_), int(h_)
        return int(tok), int(tok)

    sizes = [parse(s) for s in args.sizes.split(",")]
    n = args.n

    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    pcfg = PointConfig(descent_steps=5)
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params, key = scene.params(), jax.random.PRNGKey(0)

    base = RenderConfig(width=W, height=H, base_radius=0.008,
                        tiles_per_splat_cap=4)
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, n, pcfg, base))(params, key)

    images = {}
    for ts in sizes:
        tw_, th_ = ts
        cfg = base.replace(tile_size=tw_, tile_height=th_)
        print(f"--- tile={tw_}x{th_}  (tiles {cfg.tiles_x}x{cfg.tiles_y}="
              f"{cfg.num_tiles}, tp={cfg.tile_pixels}, r_cap={cfg.r_cap:.2f})")

        data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(
            splats, camera)
        bin_j = jax.jit(lambda d: bin_splats_packed(d, cfg, BLOCK))
        t_bin, binned = time_fn(bin_j, data, warmup=2, iters=5)
        tiles_used = int(np.asarray(binned["tiles_used"]))
        mt = int(tiles_used * 1.15) + 8
        print(f"bin_ms={t_bin*1e3:.2f}  tiles_used={tiles_used}")

        def fused(s, c, cc=None, rc=cfg, m=mt):
            return render_splats(s, c, rc, "pallas", BLOCK,
                                 blend_max_blocks=m, blend_kernel="tile",
                                 pair_class_caps=cc, return_stats=True)

        # safe-caps frame: census + exact image
        img, stats = jax.jit(lambda s, c: fused(s, c))(splats, camera)
        n_hi, n_mid = (int(x) for x in np.asarray(stats["class_counts"]))
        cc = _class_caps(n_hi, n_mid, n, cfg.tiles_per_splat_cap)
        pairs_full = cfg.tiles_per_splat_cap * n
        pairs_cc = (cfg.tiles_per_splat_cap * cc[0] + 2 * cc[1]
                    + (n - cc[0] - cc[1])) if cc else pairs_full
        print(f"census: n_hi(>2 slots)={n_hi} n_mid(==2)={n_mid} "
              f"caps={cc}  pair_rows {pairs_full} -> {pairs_cc} "
              f"({pairs_cc/pairs_full:.2f}x)")

        t_full, (img2, _) = time_fn(
            jax.jit(lambda s, c: fused(s, c)), splats, camera,
            warmup=2, iters=5)
        print(f"fused_exact_ms={t_full*1e3:.2f}  fps={1/t_full:.1f}")
        images[ts] = np.asarray(jax.device_get(img2))

        if cc is not None:
            t_cc, (img_cc, st_cc) = time_fn(
                jax.jit(lambda s, c: fused(s, c, cc)), splats, camera,
                warmup=2, iters=5)
            ovf = bool(np.asarray(st_cc["class_overflow"]))
            dev = float(np.abs(np.asarray(jax.device_get(img_cc))
                               - images[ts]).max())
            print(f"fused_exact_classcaps_ms={t_cc*1e3:.2f}  "
                  f"fps={1/t_cc:.1f}  overflow={ovf}  max_dev={dev:.2e}")

        # fast profile (fast_math keeps canonical ranks, so class caps
        # COMPOSE with it — unlike turbo's depth_key_order)
        if cc is not None:
            fcfg = cfg.replace(fast_math=True)
            t_fc, _ = time_fn(
                jax.jit(lambda s, c: render_splats(
                    s, c, fcfg, "pallas", BLOCK, blend_max_blocks=mt,
                    blend_kernel="tile", pair_class_caps=cc)),
                splats, camera, warmup=2, iters=5)
            print(f"fused_fast_classcaps_ms={t_fc*1e3:.2f}  fps={1/t_fc:.1f}")

        # turbo preset at this tile size
        tcfg = spt.turbo_render_config(
            W, H, base_radius=0.008, tiles_per_splat_cap=4,
            tile_size=tw_, tile_height=th_)
        tdata = jax.jit(lambda s, c: splat_screen_data(s, c, tcfg))(
            splats, camera)
        tbinned = jax.jit(lambda d: bin_splats_packed(d, tcfg, BLOCK))(tdata)
        mtt = int(np.asarray(tbinned["tiles_used"]) * 1.15) + 8
        t_turbo, _ = time_fn(
            jax.jit(lambda s, c: render_splats(
                s, c, tcfg, "pallas", BLOCK, blend_max_blocks=mtt,
                blend_kernel="tile")),
            splats, camera, warmup=2, iters=5)
        print(f"fused_turbo_ms={t_turbo*1e3:.2f}  fps={1/t_turbo:.1f}")

    ref_ts = sizes[0]
    for ts in sizes[1:]:
        dev = float(np.abs(images[ts] - images[ref_ts]).max())
        print(f"exact image max|{ts} - {ref_ts}| = {dev:.3e}")


if __name__ == "__main__":
    main()
