"""On-device parity gate: oracle vs Pallas vs XLA tiles on the REAL TPU.

The CPU test suite runs the Pallas kernel in interpreter mode only; Mosaic
lowering differences (transcendental ulps, MXU passes, roll lowering) can
only be caught on hardware.  This script renders the demo scene through all
three compositors on the attached chip and exits nonzero on drift:

    PYTHONPATH=/root/repo:/root/.axon_site python drive_tpu_parity.py

Round-2 history: this gate caught two real on-device divergences —
  1. the oracle applied the ellipse rotation in isotropic mode (the quantized
     angle grid has no exact zero), flipping hard-cutoff boundary pixels
     (max diff 0.015); splat_alpha now branches on cfg.oriented.
  2. backend cos/sin differ by ulps between libm/XLA-CPU/Mosaic; the shared
     fixed-polynomial blend.ellipse_cos_sin removes the divergence.

Also exercises parallel.sharding.render_band's Pallas branch on a 1-device
mesh (untested anywhere else).
"""

from __future__ import annotations

import os
import sys

import jax

# share bench.py's persistent compilation cache: the gate compiles ~20
# sizable programs; without the cache a full run blows past 30 min over
# the relay (each large executable re-compiles at ~30-100 s)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig, surface_render_config
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_splats, canonical_sort_data
from splat_renderer_tpu.render.compositor import render_tiles
from splat_renderer_tpu.render.oracle import render_oracle
from splat_renderer_tpu.render.pipeline import model_points, splat_screen_data

ATOL = 2e-5  # the fp32 fidelity gate (BASELINE.json; few-ulp headroom)


def _scene():
    return spt.SDFScene(
        spt.smooth_union(
            0.1,
            spt.Sphere(id="s1", radius=0.5),
            spt.Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
        )
    )


def check(name: str, cfg: RenderConfig, n: int, key: int = 0) -> bool:
    scene = _scene()
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(lambda p, k: model_points(scene, p, k, n, PointConfig(), cfg))(
        scene.params(), jax.random.PRNGKey(key)
    )
    data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(splats, camera)
    img_o = np.asarray(jax.jit(lambda d: render_oracle(d, cfg))(data))
    img_p = np.asarray(
        jax.jit(lambda d: render_tiles_pallas(d, None, cfg, eps=0.0))(data)
    )

    def tiles(d):
        ds = canonical_sort_data(d, cfg)
        return render_tiles(ds, bin_splats(ds, cfg), cfg)

    img_t = np.asarray(jax.jit(tiles)(data))
    dp = np.abs(img_p - img_o).max()
    dt = np.abs(img_t - img_o).max()
    ok = dp < ATOL and dt < ATOL
    print(
        f"{name:>24}: pallas|oracle={dp:.2e}  tiles|oracle={dt:.2e}  "
        f"{'OK' if ok else 'FAIL (atol %.0e)' % ATOL}"
    )
    return ok


def check_class_partition() -> bool:
    """Class-partitioned pair expansion must be bit-identical on device."""
    from splat_renderer_tpu.render.binning import bin_splats_packed

    scene = _scene()
    cfg = RenderConfig(width=640, height=368, base_radius=0.03,
                       tiles_per_splat_cap=4)
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, 20_000, PointConfig(), cfg)
    )(scene.params(), jax.random.PRNGKey(0))
    data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(splats, camera)
    base = jax.jit(lambda d: bin_splats_packed(d, cfg, 1024))(data)
    n_hi, n_mid = (int(x) for x in np.asarray(base["class_counts"]))
    n = 20_000
    caps = (n_hi + 64, (n_mid - n_hi) + 64)
    if caps[0] + caps[1] > n:
        # census too multi-tile to partition at this n: (n, 0) degenerates
        # to the full-cap expansion, keeping the bit-equality check valid
        caps = (n, 0)
    img_b = np.asarray(
        jax.jit(lambda d: render_tiles_pallas(d, None, cfg))(data)
    )
    img_c = np.asarray(
        jax.jit(
            lambda d: render_tiles_pallas(d, None, cfg, class_caps=caps)
        )(data)
    )
    d = np.abs(img_c - img_b).max()
    ok = d == 0.0
    print(f"{'class-partition binning':>24}: class|full={d:.2e}  "
          f"{'OK' if ok else 'FAIL (expect bit-equal)'}")
    return ok


def check_engine_class_protocol() -> bool:
    """Engine must adopt pair class caps from the first-frame census (small
    splats -> partition fires) and keep rendering bit-identically."""
    from splat_renderer_tpu.render.pipeline import Engine

    scene = _scene()
    cfg = RenderConfig(width=640, height=368, base_radius=0.004,
                       tiles_per_splat_cap=4)
    eng = Engine(scene, PointConfig(), cfg, n=20_000)
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    key = jax.random.PRNGKey(3)
    img1 = np.asarray(eng.frame(camera, key))  # safe bounds + census
    h = scene.structure_hash()
    cc = eng._ccaps.get(h)
    img2 = np.asarray(eng.frame(camera, key))  # runs with adopted caps
    d = np.abs(img2 - img1).max()
    ok = cc is not None and d == 0.0
    print(f"{'engine class protocol':>24}: caps={cc}  safe|class={d:.2e}  "
          f"{'OK' if ok else 'FAIL (expect caps adopted + bit-equal)'}")
    return ok


def check_render_band() -> bool:
    """render_band's Pallas branch on a 1-device mesh vs the full-frame path."""
    from jax.sharding import Mesh, PartitionSpec as P

    scene = _scene()
    cfg = RenderConfig(width=256, height=128, base_radius=0.03,
                       tiles_per_splat_cap=16)
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, 5_000, PointConfig(), cfg)
    )(scene.params(), jax.random.PRNGKey(0))
    data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(splats, camera)

    from splat_renderer_tpu.parallel.sharding import _band_cfg, render_band

    band_cfg = _band_cfg(cfg, 1)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    fn = jax.jit(
        jax.shard_map(
            lambda d: render_band(d, jnp.int32(0), band_cfg, "pallas"),
            mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False,
        )
    )
    img_band = np.asarray(fn(data))
    img_ref = np.asarray(
        jax.jit(lambda d: render_tiles_pallas(d, None, cfg))(data)
    )
    d = np.abs(img_band - img_ref).max()
    ok = d < ATOL
    print(f"{'render_band pallas sp=1':>24}: band|full={d:.2e}  "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def check_diff_path() -> bool:
    """Differentiable path on device: the jitted scalar loss must match a
    host-side reduction of the jitted image, and one gradient step must
    descend it.

    Guards the fit pattern against a measured axon-relay miscompile: a
    jitted program that captures an image-sized array CONSTANT returns a
    wrong scalar loss (0.0101 -> 0.0373, deterministic, images unaffected).
    render/diff.py and fit_demo.py therefore pass target/splats as jit
    ARGUMENTS; this check asserts that pattern stays correct on hardware.
    """
    from splat_renderer_tpu.render import render_diff
    from splat_renderer_tpu.render.pipeline import model_points as mp

    scene = _scene()
    cfg = RenderConfig(width=64, height=64, base_radius=0.05,
                       tiles_per_splat_cap=16)
    cam = spt.Camera(azimuth=0.5, elevation=0.3, aspect=1.0)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = mp(scene, scene.params(), jax.random.PRNGKey(0), 500,
                PointConfig(), cfg)
    target = render_diff(splats, camera, cfg, method="tiles")
    theta0 = {k: jnp.full_like(splats[k], 0.5)
              for k in ("cr", "cg", "cb", "opacity")}

    def loss(theta, splats, target):
        img = render_diff(dict(splats, **theta), camera, cfg, method="tiles")
        return jnp.mean((img - target) ** 2)

    l_dev = float(jax.jit(loss)(theta0, splats, target))
    img0 = np.asarray(
        jax.jit(lambda t, s: render_diff(dict(s, **t), camera, cfg,
                                         method="tiles"))(theta0, splats)
    )
    l_host = float(((img0 - np.asarray(target)) ** 2).mean())
    g = jax.jit(jax.grad(loss))(theta0, splats, target)
    theta1 = jax.tree.map(lambda x, gx: x - 300.0 * gx, theta0, g)
    l_step = float(jax.jit(loss)(theta1, splats, target))
    ok = abs(l_dev - l_host) < 1e-6 and l_step < l_dev
    print(f"{'diff-path loss+descent':>24}: jit|host={abs(l_dev - l_host):.2e}  "
          f"step {l_dev:.6f}->{l_step:.6f}  {'OK' if ok else 'FAIL'}")
    return ok


def check_diff_pallas() -> bool:
    """Custom-VJP Pallas blend (ops/tile_blend_diff.py) on device: forward
    matches the scan diff path and gradients match its autodiff — the
    Mosaic-lowered twin of tests/test_diff.py::TestPallasDiff (interpret
    mode cannot catch lowering divergences; the round-2 exact kernel needed
    four on-device fixes)."""
    from splat_renderer_tpu.render import render_diff
    from splat_renderer_tpu.render.pipeline import model_points as mp

    scene = _scene()
    cfg = RenderConfig(width=64, height=64, base_radius=0.05,
                       tiles_per_splat_cap=16)
    cam = spt.Camera(azimuth=0.5, elevation=0.3, aspect=1.0)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = mp(scene, scene.params(), jax.random.PRNGKey(0), 500,
                PointConfig(), cfg)
    img_t = np.asarray(
        jax.jit(lambda s: render_diff(s, camera, cfg, method="tiles"))(splats)
    )
    img_p = np.asarray(
        jax.jit(lambda s: render_diff(s, camera, cfg, method="pallas"))(splats)
    )
    fwd_diff = float(np.abs(img_t - img_p).max())

    target = jnp.full((cfg.height, cfg.width, 3), 0.4)
    fields = ("px", "radius", "opacity", "cr")

    def make_loss(method):
        def f(theta, splats, target):
            img = render_diff(dict(splats, **theta), camera, cfg,
                              method=method)
            return jnp.mean((img - target) ** 2)
        return f

    theta = {k: splats[k] for k in fields}
    gt = jax.jit(jax.grad(make_loss("tiles")))(theta, splats, target)
    gp = jax.jit(jax.grad(make_loss("pallas")))(theta, splats, target)
    grad_rel = max(
        float(np.abs(np.asarray(gt[k]) - np.asarray(gp[k])).max()
              / (np.abs(np.asarray(gt[k])).max() + 1e-12))
        for k in fields
    )
    ok = fwd_diff < 2e-5 and grad_rel < 1e-3
    print(f"{'diff-pallas fwd+grad':>24}: fwd|tiles={fwd_diff:.2e}  "
          f"grad maxrel={grad_rel:.2e}  {'OK' if ok else 'FAIL'}")
    return ok


def check_sh() -> bool:
    """SH view-dependent color on device (render/sh.py): apply_sh vs an
    INDEPENDENT host-numpy basis evaluation (written in the spherical
    5z^2-1 forms, different algebra than the kernel's expanded
    polynomials), and the lit Pallas frame vs the lit tiles frame."""
    from splat_renderer_tpu.render.pipeline import render_splats
    from splat_renderer_tpu.render.sh import apply_sh

    scene = _scene()
    cfg = RenderConfig(width=128, height=128, base_radius=0.03,
                       tiles_per_splat_cap=8)
    cam = spt.Camera(azimuth=0.9, elevation=0.3, aspect=1.0)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = model_points(scene, scene.params(), jax.random.PRNGKey(0),
                          2_000, PointConfig(), cfg)
    n = int(splats["px"].shape[0])
    rng = np.random.default_rng(7)
    sh = {c: jnp.asarray(rng.normal(scale=0.2, size=(15, n))
                         .astype(np.float32)) for c in ("r", "g", "b")}
    lit = jax.jit(apply_sh)(splats, sh, camera["cam_pos"])

    p = np.stack([np.asarray(splats[f]) for f in ("px", "py", "pz")], 1)
    d = p - np.asarray(camera["cam_pos"])[None, :]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    x, y, z = (d[:, i].astype(np.float64) for i in range(3))
    B = np.stack([
        -0.4886025119029199 * y, 0.4886025119029199 * z,
        -0.4886025119029199 * x,
        1.0925484305920792 * x * y, -1.0925484305920792 * y * z,
        0.31539156525252005 * (3 * z * z - 1.0),
        -1.0925484305920792 * x * z, 0.5462742152960396 * (x * x - y * y),
        -0.5900435899266435 * y * (3 * x * x - y * y),
        2.890611442640554 * x * y * z,
        -0.4570457994644658 * y * (5 * z * z - 1.0),
        0.3731763325901154 * z * (5 * z * z - 3.0),
        -0.4570457994644658 * x * (5 * z * z - 1.0),
        1.445305721320277 * z * (x * x - y * y),
        -0.5900435899266435 * x * (x * x - 3 * y * y),
    ], 0)
    eval_diff = max(
        float(np.abs(
            np.asarray(lit[f])
            - np.clip(np.asarray(splats[f])
                      + (np.asarray(sh[ch]) * B).sum(0), 0, 1)
        ).max())
        for ch, f in (("r", "cr"), ("g", "cg"), ("b", "cb"))
    )

    img_p = np.asarray(jax.jit(
        lambda s, sh_, c: render_splats(
            apply_sh(s, sh_, c["cam_pos"]), c, cfg, "pallas")
    )(splats, sh, camera))
    img_t = np.asarray(jax.jit(
        lambda s, sh_, c: render_splats(
            apply_sh(s, sh_, c["cam_pos"]), c, cfg, "tiles")
    )(splats, sh, camera))
    frame_diff = float(np.abs(img_p - img_t).max())
    ok = eval_diff < 5e-6 and frame_diff < ATOL
    print(f"{'sh appearance':>24}: eval|host={eval_diff:.2e}  "
          f"pallas|tiles={frame_diff:.2e}  {'OK' if ok else 'FAIL'}")
    return ok


def check_depth_key_order() -> bool:
    """Turbo's depth_key_order skips the canonical record sort; same-tile
    records within ~2^-22 relative depth (360p's 10 tile bits keep 22 key
    bits) composite in arbitrary order.  The deviation must stay visually
    bounded vs the rank-ordered turbo frame (benchmarks/probe_depth_order.py
    measured ssim 1.000 / meandiff 1.5e-4 at 1M @1080p on v5e).

    SSIM is computed ON HOST with range asserts (utils.ssim.quality_gate):
    quality scalars from the device are not scoreboard-trustworthy — the
    default bf16 conv precision produced an impossible 1.2312 in BENCH_r02
    (root cause in benchmarks/probe_ssim_device.py)."""
    from splat_renderer_tpu.utils.ssim import quality_gate

    scene = _scene()
    imgs = []
    for dko in (False, True):
        cfg = spt.turbo_render_config(640, 368, base_radius=0.03,
                                      tiles_per_splat_cap=4,
                                      depth_key_order=dko)
        cam = spt.Camera(aspect=cfg.width / cfg.height)
        camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        splats = jax.jit(
            lambda p, k: model_points(scene, p, k, 20_000, PointConfig(), cfg)
        )(scene.params(), jax.random.PRNGKey(0))
        data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(splats, camera)
        imgs.append(np.asarray(
            jax.jit(lambda d: render_tiles_pallas(d, None, cfg))(data)
        ))
    s = quality_gate(imgs[1], imgs[0])
    meandiff = float(np.abs(imgs[0] - imgs[1]).mean())
    ok = np.isfinite(imgs[1]).all() and s > 0.995 and meandiff < 1e-3
    print(f"{'turbo depth-key order':>24}: ssim={s:.5f}  "
          f"meandiff={meandiff:.2e}  {'OK' if ok else 'FAIL'}")
    return ok


def check_turbo_at_scale() -> bool:
    """Turbo vs exact at the SHIPPING scale (1M @1080p) — the r02 anomaly
    appeared exactly here while the old gate ran at 20k @360p (1/144th the
    scale).  Renders both presets at the bench config, asserts image range /
    finiteness on host, and gates host-side SSIM >= 0.99.  This is the
    driver-visible twin of bench.py's quality metric: a turbo regression or
    an out-of-range render at scale can never again ship ungated."""
    from splat_renderer_tpu.render.binning import bin_splats_packed
    from splat_renderer_tpu.render.pipeline import render_splats
    from splat_renderer_tpu.utils.ssim import quality_gate

    scene = _scene()
    cam = spt.Camera(aspect=1920 / 1080)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    base = RenderConfig(width=1920, height=1080, base_radius=0.008,
                        tiles_per_splat_cap=4)
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, 1_000_000, PointConfig(), base)
    )(scene.params(), jax.random.PRNGKey(0))

    imgs = []
    for cfg in (base, spt.turbo_render_config(
            1920, 1080, base_radius=0.008, tiles_per_splat_cap=4)):
        data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(
            splats, camera)
        binned = jax.jit(lambda d: bin_splats_packed(d, cfg, 1024))(data)
        mt = int(np.asarray(binned["tiles_used"]) * 1.15) + 8
        img = jax.jit(lambda s, c: render_splats(
            s, c, cfg, "pallas", 1024, blend_max_blocks=mt,
            blend_kernel="tile"))(splats, camera)
        imgs.append(np.asarray(jax.device_get(img)))

    try:
        s = quality_gate(imgs[1], imgs[0])
    except AssertionError as e:
        print(f"{'turbo @1M/1080p':>24}: {e}  FAIL")
        return False
    ok = s >= 0.99
    print(f"{'turbo @1M/1080p':>24}: ssim={s:.5f}  {'OK' if ok else 'FAIL'}")
    return ok


def check_gbuffer() -> bool:
    """Kernel-speed G-buffer (depth-carrying pair stream + spare-row MXU
    channel, ops/tile_blend.py with_depth) vs the scan path ON DEVICE —
    the Mosaic lowering of the depth-key bitcast recovery and the 4-channel
    contraction is only exercised here (tests gate it in interpret mode)."""
    from splat_renderer_tpu.render import render_gbuffer

    scene = _scene()
    cfg = RenderConfig(width=640, height=368, base_radius=0.03,
                       tiles_per_splat_cap=4, tile_size=32, tile_height=16)
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, 20_000, PointConfig(), cfg)
    )(scene.params(), jax.random.PRNGKey(0))
    ref = jax.jit(
        lambda s, c: render_gbuffer(s, c, cfg, method="tiles")
    )(splats, camera)
    out = jax.jit(
        lambda s, c: render_gbuffer(s, c, cfg, method="pallas", eps=0.0)
    )(splats, camera)
    ok = True
    msg = []
    for ch, tol in (("rgb", ATOL), ("alpha", ATOL), ("depth", 1e-3)):
        d = float(np.abs(np.asarray(out[ch]) - np.asarray(ref[ch])).max())
        ok &= d < tol
        msg.append(f"{ch}={d:.2e}")
    print(f"{'gbuffer kernel 360p':>24}: {'  '.join(msg)}  "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def check_blend_group() -> bool:
    """Blend predicate-group knob (ops/tile_blend._blend_window group=):
    256-/512-record groups vs the 128 default on device.

    Two gates: (a) eps=0 — no saturation skip can fire, the sub folds run
    the identical op sequence, output must be BIT-identical; (b) default
    eps — the coarser saturation checkpoints skip different sub-threshold
    contributions (same approximation family as sat_every), bounded by a
    few x transmittance_eps (measured 2.9e-3 at eps=0.01 on device)."""
    from splat_renderer_tpu.render.pipeline import render_splats

    scene = _scene()
    cfg = RenderConfig(width=640, height=368, base_radius=0.03,
                       tiles_per_splat_cap=4, tile_size=32, tile_height=16)
    cam = spt.Camera(aspect=cfg.width / cfg.height)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, 20_000, PointConfig(), cfg)
    )(scene.params(), jax.random.PRNGKey(0))
    ok = True
    msg = []
    for eps, tol, tag in ((0.0, 0.0, "eps0"),
                          (-1.0, 5 * cfg.transmittance_eps, "def")):
        imgs = {}
        for g in (128, 256, 512):
            imgs[g] = np.asarray(jax.jit(
                lambda s, c, g=g, e=eps: render_splats(
                    s, c, cfg, "pallas", 1024, blend_kernel="tile",
                    blend_group=g, blend_eps=e)
            )(splats, camera))
        d = max(float(np.abs(imgs[g] - imgs[128]).max()) for g in (256, 512))
        ok &= d <= tol
        msg.append(f"{tag}={d:.2e}")
    print(f"{'blend group 256/512':>24}: {'  '.join(msg)}  "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main() -> int:
    print(f"device: {jax.devices()[0]}")
    ok = True
    ok &= check(
        "isotropic 1080p",
        RenderConfig(width=1920, height=1080, base_radius=0.03,
                     tiles_per_splat_cap=4),
        20_000,
    )
    ok &= check(
        "isotropic-ts32 360p",  # the round-3 headline tile size: the whole
        # quantize/bin/blend chain re-gated at 32 px tiles (r grid doubles)
        RenderConfig(width=640, height=368, base_radius=0.03,
                     tiles_per_splat_cap=4, tile_size=32),
        20_000,
    )
    ok &= check(
        "isotropic-32x16 360p",  # rectangular tiles (the round-3 headline
        # geometry): ts=32 straddle collapse in x at ts=16 blend pixels;
        # Mosaic lowering of the rect pixel-coord reconstruction
        # (lane % tw, lane // tw with tw != th) gated on the real chip
        RenderConfig(width=640, height=368, base_radius=0.03,
                     tiles_per_splat_cap=4, tile_size=32, tile_height=16),
        20_000,
    )
    ok &= check(
        "oriented-alpha 360p",
        RenderConfig(width=640, height=368, base_radius=0.03,
                     tiles_per_splat_cap=16, oriented=True),
        20_000,
    )
    ok &= check(
        "ewa-ellipse 360p",
        RenderConfig(width=640, height=368, base_radius=0.03,
                     tiles_per_splat_cap=16, oriented=True, ellipse="ewa"),
        20_000,
    )
    ok &= check(
        "opaque-surface 360p",
        surface_render_config(640, 368, base_radius=0.02, tiles_per_splat_cap=16),
        20_000,
    )
    ok &= check(
        "quad-surface 360p",  # reference-exact square quads (cfg.quad)
        surface_render_config(640, 368, base_radius=0.02,
                              tiles_per_splat_cap=16, quad=True),
        20_000,
    )
    ok &= check(
        "turbo 360p",  # approximation preset must still self-gate vs its
        # own oracle (the deviation is only vs margin-1.5 ground truth);
        # depth_key_order off here — its coarser compositing order breaks
        # ulp equality by design and gets its own bounded gate below
        spt.turbo_render_config(640, 368, base_radius=0.03,
                                tiles_per_splat_cap=4,
                                depth_key_order=False),
        20_000,
    )
    ok &= check_depth_key_order()
    ok &= check_turbo_at_scale()
    ok &= check(
        "antialias 360p",  # aa_dilation is record-domain (shade_planes):
        # oracle/tiles/pallas consume the same dilated record, so the ulp
        # gate must hold with it on, isotropic and EWA alike
        RenderConfig(width=640, height=368, base_radius=0.03,
                     tiles_per_splat_cap=16, aa_dilation=0.3),
        20_000,
    )
    ok &= check(
        "antialias-ewa 360p",
        RenderConfig(width=640, height=368, base_radius=0.03,
                     tiles_per_splat_cap=16, oriented=True, ellipse="ewa",
                     aa_dilation=0.3),
        20_000,
    )
    ok &= check_class_partition()
    ok &= check_engine_class_protocol()
    ok &= check_render_band()
    ok &= check_diff_path()
    ok &= check_diff_pallas()
    ok &= check_sh()
    ok &= check_gbuffer()
    ok &= check_blend_group()
    print("PARITY GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
