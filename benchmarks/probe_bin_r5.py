"""Decompose the bin stage (~9.0 ms sustained at the 1M@1080p 32x16+cc
headline) into its sort components, and A/B tighter class-cap headroom.

Programs (interleaved, sustained marginals — barrier-free):
  P1   project+pack (words)
  P2a  P1 + record sort (canonical ranks)
  P2b  P2a + class sort (class-major reorder)
  P2   P1 + full binning (expansion + pair sort + tables)
  P2t  P2 with headroom-1.1 class caps (tighter pair-sort input)

Deltas: record sort = P2a-P1, class sort = P2b-P2a,
expansion+pair-sort+tables = P2-P2b, caps tightening = P2-P2t.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_bin_r5.py
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
from splat_renderer_tpu.render.binning import bin_packed_words, bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    _capacity_class,
    model_points,
    splat_screen_data,
)
from splat_renderer_tpu.render.projector import splat_screen_words
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
    camera = {k: jnp.asarray(v)
              for k, v in spt.Camera(aspect=W / H).arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, PointConfig(), rcfg)
    )(scene.params(), jax.random.PRNGKey(0))
    b32 = jax.jit(lambda s, c: bin_splats_packed(
        splat_screen_data(s, c, rcfg), rcfg, BLOCK))(splats, camera)
    n_hi, n_mid = (int(x) for x in np.asarray(b32["class_counts"]))

    def caps(headroom):
        c4 = _capacity_class(n_hi, headroom)
        c2 = _capacity_class(n_mid - n_hi, headroom)
        return (c4, c2)

    cc125, cc110 = caps(1.25), caps(1.10)
    rows = lambda cc: 4 * cc[0] + 2 * cc[1] + (N - cc[0] - cc[1])
    print(f"census ({n_hi}, {n_mid}); caps 1.25 {cc125} -> {rows(cc125)} "
          f"rows; 1.10 {cc110} -> {rows(cc110)} rows", file=sys.stderr)

    def p1(s, c):
        return splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)

    def p2a(s, c):
        w = p1(s, c)
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
        r10 = jnp.minimum(w["w_ro"] & jnp.uint32(0xFFFF), jnp.uint32(1023))
        iota_r = (iota.astype(jnp.uint32) << 10) | r10
        return jax.lax.sort((w["dk"], iota_r, w["w_pos"], w["w_rgb"]),
                            num_keys=2, is_stable=False)

    def p2b(s, c):
        dk_s, iota_r_s, w_pos, w_rgb = p2a(s, c)
        # class-major reorder, the fold_r form (code:2 | rank | r:10)
        r10 = iota_r_s & jnp.uint32(0x3FF)
        rank = jax.lax.broadcasted_iota(
            jnp.int32, (N, 1), 0)[:, 0].astype(jnp.uint32)
        code = (rank % 3)  # stand-in code column: same sort cost shape
        rank_bits = 20
        ckey = (code << (rank_bits + 10)) | (rank << 10) | r10
        return jax.lax.sort((ckey, w_pos, w_rgb), num_keys=1,
                            is_stable=False)

    def p2(s, c, cc):
        w = p1(s, c)
        return bin_packed_words(w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"],
                                rcfg, BLOCK, class_caps=cc)["pair_w"]

    variants = [("P1", lambda s, c: p1(s, c)),
                ("P2a", p2a), ("P2b", p2b),
                ("P2", lambda s, c: p2(s, c, cc125)),
                ("P2t", lambda s, c: p2(s, c, cc110))]
    fns = []
    for name, f in variants:
        jf = jax.jit(f)
        jax.device_get(jax.tree.leaves(jf(splats, camera))[0].ravel()[:1])
        print(f"compiled {name}", file=sys.stderr)
        fns.append((name, jf))

    tot = {name: [float("inf"), float("inf")] for name, _ in fns}
    for _ in range(3):
        for name, f in fns:
            ts, _ = time_fn(f, splats, camera, warmup=0, iters=5)
            tl, _ = time_fn(f, splats, camera, warmup=0, iters=20)
            tot[name][0] = min(tot[name][0], ts * 5)
            tot[name][1] = min(tot[name][1], tl * 20)
    sus = {name: (t[1] - t[0]) / 15 * 1e3 for name, t in tot.items()}
    for name, v in sus.items():
        print(f"{name}: {v:.3f} ms sustained")
    print(f"record sort = {sus['P2a'] - sus['P1']:.3f} ms; "
          f"class sort = {sus['P2b'] - sus['P2a']:.3f} ms; "
          f"expand+pairsort+tables = {sus['P2'] - sus['P2b']:.3f} ms; "
          f"caps 1.25->1.10 saves {sus['P2'] - sus['P2t']:.3f} ms")


if __name__ == "__main__":
    main()
