"""A/B the reference's LIVE path (opaque oriented surface splats, 1M
@1080p) across blend/binning configurations — VERDICT r4 item 3.

BENCH_r04's surface step (42.4 ms) rendered via the FLAT kernel with no
class caps and group=128 — none of the headline machinery.  Opaque
alpha=1 saturates transmittance after ONE covering record, so the
tile-major kernel's saturation exit (which stops DMA too) should be
maximally effective here.  Variants (in-process interleaved):

  A: flat kernel, no class caps, group=128       [the r04 configuration]
  B: tile kernel, no class caps, group=256
  C: tile kernel, class caps (census), group=256 [the r05 bench config]
  D: C on 32x16 tiles

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_surface_r5.py
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
from splat_renderer_tpu.config import PointConfig
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
BLOCK = 1024


def main() -> None:
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    pcfg = PointConfig(descent_steps=5)
    params = scene.params()
    key = jax.random.PRNGKey(0)

    cfgs = {
        "16": spt.surface_render_config(W, H, base_radius=0.004,
                                        tiles_per_splat_cap=4),
    }
    cfgs["32x16"] = cfgs["16"].replace(tile_size=32, tile_height=16)

    setups = {}
    for name, scfg in cfgs.items():
        ssurf = jax.jit(lambda p, k, c=scfg: model_points(
            scene, p, k, N, pcfg, c))(params, key)
        b = jax.jit(lambda s, c, cf=scfg: bin_splats_packed(
            splat_screen_data(s, c, cf), cf, BLOCK))(ssurf, camera)
        mt = int(np.asarray(b["tiles_used"]) * 1.15) + 8
        mbw = int(np.asarray(b["block_off"])[-1])
        mbw = max(1024, -(-int(mbw * 1.25) // 1024) * 1024)
        n_hi, n_mid = (int(x) for x in np.asarray(b["class_counts"]))
        cc = _class_caps(n_hi, n_mid, N, scfg.tiles_per_splat_cap)
        setups[name] = (scfg, mt, mbw, cc)
        print(f"{name}: tiles_used~{mt} windows~{mbw} census "
              f"({n_hi}, {n_mid}) caps {cc}", file=sys.stderr)

    def frame(p, c, k, scfg, kern, mb, cc, group):
        s = model_points(scene, p, k, N, pcfg, scfg)
        return render_splats(s, c, scfg, "pallas", BLOCK,
                             blend_max_blocks=mb, blend_kernel=kern,
                             pair_class_caps=cc, blend_group=group)

    s16, mt16, mbw16, cc16 = setups["16"]
    s32, mt32, mbw32, cc32 = setups["32x16"]
    only = os.environ.get("PROBE_VARIANTS", "")
    variants = [
        ("A flat nocc g128 ts16", (s16, "flat", mbw16, None, 128)),
        ("B tile nocc g256 ts16", (s16, "tile", mt16, None, 256)),
        ("C tile cc   g256 ts16", (s16, "tile", mt16, cc16, 256)),
        ("D tile cc   g256 32x16", (s32, "tile", mt32, cc32, 256)),
    ]
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0].split()[0] in keep]
    fns = []
    for name, (scfg, kern, mb, cc, group) in variants:
        if cc is None and name.split()[2] == "cc":
            print(f"skip {name}: census says caps do not pay",
                  file=sys.stderr)
            continue
        f = jax.jit(lambda p, c, k, a=scfg, b_=kern, m=mb, cc_=cc, g=group:
                    frame(p, c, k, a, b_, m, cc_, g))
        jax.device_get(jax.tree.leaves(f(params, camera, key))[0].ravel()[:1])
        print(f"compiled {name}", file=sys.stderr)
        fns.append((name, f))

    results = {name: [] for name, _ in fns}
    for burst in range(4):
        for name, f in fns:
            t, _ = time_fn(f, params, camera, key, warmup=1, iters=5)
            results[name].append(t * 1e3)
    for name, ts in results.items():
        print(f"{name}: bursts {['%.2f' % t for t in ts]}  "
              f"min {min(ts):.3f} ms")


if __name__ == "__main__":
    main()
