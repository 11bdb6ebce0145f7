"""Multi-view dataset generation — the production serving loop.

Renders V orbit views of an (optionally animated) SDF scene per step and
writes PNGs + camera parameters (JSON), the standard layout for
novel-view-synthesis training data.  One fused XLA program renders all views
of a step (BASELINE.json config 5).  --gbuffer additionally writes per-view
depth (16-bit PNG, per-frame affine recorded in the manifest) and alpha
coverage channels (render_views_gbuffer) — supervision channels the
reference's color-only compositor cannot produce.

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
from splat_renderer_tpu.render import render_views, render_views_gbuffer
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.utils.image import unflatten_rows, write_png, write_png16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/splat_dataset")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument(
        "--base-radius", type=float, default=0.012,
        help="world-space splat radius scale (size to the output "
             "resolution: ~10/width keeps footprints at a few pixels)",
    )
    ap.add_argument(
        "--gbuffer", action="store_true",
        help="also write per-view depth (16-bit PNG, per-frame normalized "
             "with depth_min/depth_max in the manifest) and alpha coverage "
             "channels (render_views_gbuffer)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    s1 = spt.Sphere(id="sphere1", radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))

    rcfg = spt.RenderConfig(
        width=args.width, height=args.height, base_radius=args.base_radius,
        tiles_per_splat_cap=8,
    )
    pcfg = spt.PointConfig()

    @jax.jit
    def step_fn(params, cameras, key):
        splats = model_points(scene, params, key, args.points, pcfg, rcfg)
        if args.gbuffer:
            gb = render_views_gbuffer(splats, cameras, rcfg)
            rgb = jnp.round(jnp.clip(gb["rgb"], 0.0, 1.0) * 255.0)
            rgb = rgb.astype(jnp.uint8).reshape(
                args.views, args.height, args.width * 3
            )
            return rgb, gb["depth"], gb["alpha"]
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
        out = step_fn(scene.params(), cameras, jax.random.PRNGKey(step))
        if args.gbuffer:
            rgb_flat, depth, alpha = (np.asarray(x) for x in out)
            imgs = unflatten_rows(rgb_flat, args.width)
        else:
            imgs = unflatten_rows(np.asarray(out), args.width)
            depth = alpha = None
        # thread the PNG writes: zlib releases the GIL, so V encodes overlap
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(args.views, 8)) as pool:
            futs = []
            for v in range(args.views):
                name = f"step{step:03d}_view{v:02d}.png"
                futs.append(pool.submit(
                    write_png, os.path.join(args.out, name), imgs[v]
                ))
                frame = {
                    "file": name,
                    "step": step,
                    "time": t,
                    "view_proj": np.asarray(cam_arrays["view_proj"][v]).tolist(),
                    "cam_pos": np.asarray(cam_arrays["cam_pos"][v]).tolist(),
                }
                if args.gbuffer:
                    # per-frame depth normalization: d16 = (d - min)/(max -
                    # min) over hit pixels; background (alpha ~ 0) stays 0.
                    # The manifest records the affine so consumers recover
                    # metric camera distance exactly (up to u16 rounding).
                    hit = alpha[v] > 1e-6
                    dmin = float(depth[v][hit].min()) if hit.any() else 0.0
                    dmax = float(depth[v][hit].max()) if hit.any() else 0.0
                    dn = np.where(
                        hit, (depth[v] - dmin) / max(dmax - dmin, 1e-9), 0.0
                    )
                    dname = f"step{step:03d}_view{v:02d}_depth.png"
                    aname = f"step{step:03d}_view{v:02d}_alpha.png"
                    futs.append(pool.submit(
                        write_png16, os.path.join(args.out, dname), dn
                    ))
                    futs.append(pool.submit(
                        write_png16, os.path.join(args.out, aname), alpha[v]
                    ))
                    frame.update({
                        "depth_file": dname, "alpha_file": aname,
                        "depth_min": dmin, "depth_max": dmax,
                    })
                manifest["frames"].append(frame)
            for fu in futs:
                fu.result()
        print(f"step {step}: wrote {args.views} views")

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(f"dataset: {len(manifest['frames'])} frames in {args.out}")


if __name__ == "__main__":
    main()
