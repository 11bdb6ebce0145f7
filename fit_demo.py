"""Inverse-rendering demo: recover splat appearance by gradient descent.

A capability the WebGPU reference cannot express (its pipeline is
forward-only WGSL): here the renderer is a JAX program, so `jax.grad` flows
from an image loss back to splat colors / opacities / positions
(render/diff.py).  This demo renders a target image from the demo scene,
re-initializes all splat colors to gray, and fits them back to the target
with Adam — a miniature 3DGS-style appearance optimization.

    python fit_demo.py [--steps 150] [--n 2000] [--size 128] [--method tiles]
                       [--views 4] [--fields cr,cg,cb,opacity,px,py,pz,radius]
                       [--ply-in scene.ply] [--ply-out fitted.ply] [--sh]
                       [--checkpoint fit_state.npz]
    python fit_demo.py --dataset /path/to/gbuffer_dataset   # train from disk

--views M fits against M orbit-ring views jointly (multi-view inverse
rendering); --fields selects what to optimize — appearance fields start from
flat gray, geometry fields (px/py/pz/radius) start from a perturbed truth
and must descend back.  Prints the loss curve and final PSNR; optionally
writes before/after PNGs with --out.
"""

import argparse
import time

import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu import fit
from splat_renderer_tpu.render import render_diff
from splat_renderer_tpu.render.pipeline import model_points


def _fit_dataset(args):
    """--dataset mode: the full from-files training loop — load a
    datagen --gbuffer dataset, lift its depth/alpha channels into a splat
    point cloud (data.backproject_gbuffer), and fit the requested fields
    against the dataset images.  No scene access anywhere: geometry,
    colors and cameras all come from disk (the 3DGS workflow with the
    G-buffer standing in for SfM points)."""
    ds = spt.load_dataset(args.dataset, gbuffer=True)
    cfg = spt.RenderConfig(width=ds["width"], height=ds["height"],
                           tiles_per_splat_cap=8)
    splats = spt.backproject_gbuffer(ds, n_max=args.n if args.n else None)
    n = splats["px"].shape[0]
    print(f"backprojected {n} splats from {len(ds['cameras'])} views of "
          f"{args.dataset}")

    fit_fields = tuple(f.strip() for f in args.fields.split(",") if f.strip())
    appearance = set(fit.FIT_FIELDS_APPEARANCE)
    init = {k: jnp.full_like(splats[k], 0.5)
            for k in fit_fields if k in appearance}

    depth_targets = None
    if args.depth_weight > 0:
        if ds.get("depth") is None:
            raise SystemExit("--depth-weight needs a --gbuffer dataset "
                             "(no depth channel in the manifest)")
        if args.method != "tiles":
            raise SystemExit("--depth-weight requires --method tiles "
                             "(the Pallas VJP kernels are color-only)")
        depth_targets = ds["depth"]
        print(f"RGB-D fitting: depth L1 weight {args.depth_weight}")

    t0 = time.perf_counter()
    fitted, losses = fit.fit_splats(
        splats, ds["cameras"], ds["images"], cfg, fields=fit_fields,
        steps=args.steps, lr=args.lr, method=args.method, init=init,
        log_every=10, checkpoint_path=args.checkpoint,
        checkpoint_every=25 if args.checkpoint else 0,
        resume=bool(args.checkpoint),
        depth_targets=depth_targets, depth_weight=args.depth_weight,
    )
    dt = time.perf_counter() - t0
    print(f"{args.steps} optimization steps in {dt:.1f} s "
          f"({1e3 * dt / args.steps:.1f} ms/step, {n} splats, "
          f"{len(ds['cameras'])} views, fields={','.join(fit_fields)}, "
          f"final psnr {float(fit.psnr(losses[-1])):.1f} dB)")
    if args.out:
        import numpy as np

        from splat_renderer_tpu.utils.image import write_png

        cam = ds["cameras"][0]
        for tag, img in (
            ("target", ds["images"][0]),
            ("init", render_diff(dict(splats, **init), cam, cfg,
                                 method=args.method)),
            ("fit", render_diff(fitted, cam, cfg, method=args.method)),
        ):
            path = f"{args.out}_{tag}.png"
            write_png(path, np.asarray(jnp.clip(img, 0, 1)))
            print("wrote", path)
    if args.ply_out:
        from splat_renderer_tpu.utils import save_ply

        save_ply(args.ply_out, fitted)
        print("wrote", args.ply_out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--method", choices=("oracle", "tiles", "pallas"),
                    default="tiles",
                    help="'pallas' = custom-VJP Pallas kernels "
                         "(ops/tile_blend_diff.py): the fast path on TPU")
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--views", type=int, default=1,
                    help="fit against this many orbit-ring views jointly")
    ap.add_argument("--fields", type=str, default="cr,cg,cb,opacity",
                    help="comma-separated splat fields to optimize "
                         "(any of cr,cg,cb,opacity,px,py,pz,radius)")
    ap.add_argument("--out", type=str, default=None,
                    help="write <out>_target/init/fit.png")
    ap.add_argument("--ply-in", type=str, default=None,
                    help="fit THIS 3DGS .ply scene instead of the demo "
                         "scene's modeled splats (utils/ply.py)")
    ap.add_argument("--ply-out", type=str, default=None,
                    help="export the fitted splats as a 3DGS .ply")
    ap.add_argument("--sh", action="store_true",
                    help="view-dependent color (render/sh.py): keep a "
                         "--ply-in scene's f_rest bands lighting every view, "
                         "or (without --ply-in) FIT degree-1 coefficients "
                         "from zero alongside --fields")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="checkpoint the training state here every 25 "
                         "steps and resume from it if it exists")
    ap.add_argument("--dataset", type=str, default=None,
                    help="train from a datagen.py --gbuffer dataset "
                         "directory instead of synthesizing targets: "
                         "geometry initializes by backprojecting the "
                         "depth/alpha channels (data.backproject_gbuffer), "
                         "targets are the dataset images, all views are "
                         "used (--views/--size/--ply-in ignored)")
    ap.add_argument("--depth-weight", type=float, default=0.0,
                    help="dataset mode: add depth_weight * masked-L1 between "
                         "the rendered expected-depth channel and the "
                         "dataset's depth maps (RGB-D supervision through "
                         "render_diff_gbuffer; constrains the along-ray "
                         "direction color losses barely see)")
    args = ap.parse_args()

    if args.dataset:
        _fit_dataset(args)
        return

    scene = spt.SDFScene(
        spt.smooth_union(
            0.15,
            spt.Sphere(id="s1", radius=0.5),
            spt.Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
        )
    )
    cfg = spt.RenderConfig(width=args.size, height=args.size,
                           base_radius=0.05, tiles_per_splat_cap=16)
    cameras = []
    for v in range(args.views):
        cam = spt.Camera(
            azimuth=0.5 + 2.0 * 3.14159265 * v / max(args.views, 1),
            elevation=0.3, aspect=1.0,
        )
        cameras.append({k: jnp.asarray(a) for k, a in cam.arrays().items()})
    sh = None
    fit_sh = False
    if args.ply_in:
        from splat_renderer_tpu.utils import load_ply

        if args.sh:
            from splat_renderer_tpu.render.sh import sh_degree

            splats, sh = load_ply(args.ply_in, with_sh=True)
            deg = sh_degree(sh)
            print(f"loaded SH degree {deg}" if sh is not None
                  else "no f_rest bands in file")
        else:
            splats = load_ply(args.ply_in)
        print(f"loaded {splats['px'].shape[0]} splats from {args.ply_in}")
    else:
        splats = model_points(
            scene, scene.params(), jax.random.PRNGKey(0), args.n,
            spt.PointConfig(), cfg,
        )
        if args.sh:  # no file bands: fit degree-1 coefficients from zero
            n_s = splats["px"].shape[0]
            sh = {c: 0.25 * jax.random.normal(jax.random.PRNGKey(40 + i),
                                              (3, n_s))
                  for i, c in enumerate(("r", "g", "b"))}
            fit_sh = True

    targets = fit.render_targets(splats, cameras, cfg, method=args.method,
                                 sh=sh)
    if fit_sh:  # targets carry the synthetic truth; the fit starts from zero
        sh = {c: jnp.zeros_like(v) for c, v in sh.items()}
    camera, target = cameras[0], targets[0]

    fit_fields = tuple(f.strip() for f in args.fields.split(",") if f.strip())
    appearance = set(fit.FIT_FIELDS_APPEARANCE)
    noise_key = jax.random.PRNGKey(7)
    init = {}
    for k in fit_fields:
        if k in appearance:  # gray/flat start — recover appearance
            init[k] = jnp.full_like(splats[k], 0.5)
        else:  # geometry: perturb the truth — recover shape
            noise_key, sub = jax.random.split(noise_key)
            init[k] = splats[k] + 0.02 * jax.random.normal(sub, splats[k].shape)

    t0 = time.perf_counter()
    res = fit.fit_splats(
        splats, cameras, targets, cfg, fields=fit_fields, steps=args.steps,
        lr=args.lr, method=args.method, init=init, log_every=10,
        checkpoint_path=args.checkpoint,
        checkpoint_every=25 if args.checkpoint else 0,
        resume=bool(args.checkpoint),
        sh=sh, fit_sh=fit_sh,
    )
    fitted, losses = res[0], res[1]
    sh_fitted = res[2] if fit_sh else sh
    dt = time.perf_counter() - t0
    print(f"{args.steps} optimization steps in {dt:.1f} s "
          f"({1e3 * dt / args.steps:.1f} ms/step, {args.n} splats, "
          f"{args.size}x{args.size}, {args.views} view(s), "
          f"fields={','.join(fit_fields)}, method={args.method}, "
          f"final psnr {float(fit.psnr(losses[-1])):.1f} dB)")

    if args.out:
        from splat_renderer_tpu.utils.image import write_png
        import numpy as np

        from splat_renderer_tpu.render.sh import apply_sh

        def lit(s, sh_):
            return (apply_sh(s, sh_, camera["cam_pos"])
                    if sh_ is not None else s)

        init_img = render_diff(lit(dict(splats, **init), sh), camera, cfg,
                               method=args.method)
        fit_img = render_diff(lit(fitted, sh_fitted), camera, cfg,
                              method=args.method)
        for tag, img in (("target", target), ("init", init_img),
                         ("fit", fit_img)):
            path = f"{args.out}_{tag}.png"
            write_png(path, np.asarray(jnp.clip(img, 0, 1)))
            print("wrote", path)

    if args.ply_out:
        from splat_renderer_tpu.utils import save_ply

        save_ply(args.ply_out, fitted, sh=sh_fitted)
        print("wrote", args.ply_out)


if __name__ == "__main__":
    main()
