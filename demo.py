"""Interactive demo: the reference's animated demo scene (src/main.ts:58-116)
served to a browser with mouse orbit.  Run on a TPU host:

    python demo.py [--surface] [--port 8000]
    python demo.py --ply garden.ply      # orbit a pre-trained 3DGS scene
                                         # (f_rest SH bands rendered live)
"""

import argparse
import math

import splat_renderer_tpu as spt
from splat_renderer_tpu.render.pipeline import Engine, SplatEngine
from splat_renderer_tpu.viewer import serve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--surface", action="store_true",
                    help="opaque surface mode (the reference's live path)")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--points", type=int, default=None)
    ap.add_argument("--ply", type=str, default=None,
                    help="serve THIS 3DGS .ply scene (with its SH bands) "
                         "instead of the SDF demo scene")
    ap.add_argument("--cap", type=int, default=8,
                    help="tiles_per_splat_cap (raise for big-footprint "
                         "scenes; bench reports radius_clamped_frac)")
    ap.add_argument("--aa", type=float, default=0.0, metavar="PX2",
                    help="anti-aliasing dilation in px^2 (0.3 = the 3DGS "
                         "convention; keeps sub-pixel splats from popping "
                         "when orbiting out from a .ply scene)")
    args = ap.parse_args()

    if args.ply:
        from splat_renderer_tpu.utils import load_ply

        splats, sh = load_ply(args.ply, with_sh=True)
        rcfg = spt.RenderConfig(width=args.width, height=args.height,
                                tiles_per_splat_cap=args.cap,
                                aa_dilation=args.aa)
        n = splats["px"].shape[0]
        print(f"loaded {n} splats from {args.ply}"
              + (" (with SH bands)" if sh is not None else ""))
        serve(SplatEngine(splats, rcfg, sh=sh), port=args.port)
        return

    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))

    if args.surface:
        rcfg = spt.surface_render_config(args.width, args.height,
                                         tiles_per_splat_cap=8)
    else:
        rcfg = spt.RenderConfig(width=args.width, height=args.height,
                                base_radius=0.015, tiles_per_splat_cap=8,
                                aa_dilation=args.aa)
    eng = Engine(scene, spt.PointConfig(), rcfg, n=args.points)

    def animate(t):
        # the reference's parameter animation (src/main.ts:113-116)
        s1.position[0] = math.sin(t) * 0.3
        s1.position[1] = math.cos(t * 0.7) * 0.2
        s2.radius = 0.25 + 0.1 * math.sin(t * 2)

    serve(eng, port=args.port, animate=animate)


if __name__ == "__main__":
    main()
