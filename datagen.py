"""Multi-view dataset generation — the production serving loop.

Renders V orbit views of an (optionally animated) SDF scene per step and
writes PNGs + camera parameters (JSON), the standard layout for
novel-view-synthesis training data.  One fused XLA program renders all views
of a step (BASELINE.json config 5).

    python datagen.py --out /tmp/ds --views 8 --steps 4 --points 200000
"""

from __future__ import annotations

import argparse
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.render import render_views
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.utils.image import unflatten_rows, write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/splat_dataset")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    s1 = spt.Sphere(id="sphere1", radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))

    rcfg = spt.RenderConfig(
        width=args.width, height=args.height, base_radius=0.012,
        tiles_per_splat_cap=8,
    )
    pcfg = spt.PointConfig()

    @jax.jit
    def step_fn(params, cameras, key):
        splats = model_points(scene, params, key, args.points, pcfg, rcfg)
        # device-side u8 + flat rows: 4x less host transfer, no lane-padded
        # (V, H, W, 3) output, no host-side conversion (utils/image.py)
        return render_views(splats, cameras, rcfg, flat=True, as_uint8=True)

    manifest = {"frames": [], "width": args.width, "height": args.height,
                "fov_deg": 45.0}
    for step in range(args.steps):
        t = step / 30.0
        # reference's animation (src/main.ts:113-116)
        s1.position[0] = math.sin(t) * 0.3
        s1.position[1] = math.cos(t * 0.7) * 0.2
        s2.radius = 0.25 + 0.1 * math.sin(t * 2)

        cam_arrays = spt.orbit_ring(
            args.views, aspect=args.width / args.height,
            elevation=0.4 + 0.1 * math.sin(t),
        )
        cameras = {k: jnp.asarray(v) for k, v in cam_arrays.items()}
        imgs = unflatten_rows(
            np.asarray(step_fn(scene.params(), cameras,
                               jax.random.PRNGKey(step))),
            args.width,
        )
        # thread the PNG writes: zlib releases the GIL, so V encodes overlap
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(args.views, 8)) as pool:
            futs = []
            for v in range(args.views):
                name = f"step{step:03d}_view{v:02d}.png"
                futs.append(pool.submit(
                    write_png, os.path.join(args.out, name), imgs[v]
                ))
                manifest["frames"].append({
                    "file": name,
                    "step": step,
                    "time": t,
                    "view_proj": np.asarray(cam_arrays["view_proj"][v]).tolist(),
                    "cam_pos": np.asarray(cam_arrays["cam_pos"][v]).tolist(),
                })
            for fu in futs:
                fu.result()
        print(f"step {step}: wrote {args.views} views")

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(f"dataset: {len(manifest['frames'])} frames in {args.out}")


if __name__ == "__main__":
    main()
