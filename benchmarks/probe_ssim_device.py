"""Root-cause probe for BENCH_r02's impossible ssim_turbo_vs_exact=1.2312.

SSIM is <= 1 pointwise for in-range inputs, and the over-blend algebra
guarantees pixel values in [0, 1]; yet the r02 driver run on device emitted
1.2312 from `float(jax.jit(ssim)(img_turbo, img_exact))` (bench.py r02,
images passed as jit ARGUMENTS).  Two hypotheses from VERDICT.md:

  (a) the turbo image contained out-of-range garbage on device
      (first capture after depth_key_order entered the preset, 8def995), or
  (b) the relay miscompiled the jitted scalar reduction — a NEW wrong-scalar
      class through jit arguments (the documented one needs array CAPTURES,
      NOTES.md "RELAY MISCOMPILE").

This probe renders the exact bench config on the real chip and checks, in
order: image finiteness + range on host, host-numpy SSIM (the trustworthy
number), the on-device jit(ssim) scalar fed device arrays (the r02 path),
the same fed host round-tripped copies, and jit(ssim) under repeated calls.
Run:  python benchmarks/probe_ssim_device.py

ROOT CAUSE (found by this probe, round 3): NEITHER hypothesis — the images
were finite and in [0.05, 0.946], and the wrong scalar reproduced
deterministically even in EAGER op-by-op mode, so no program-scale
miscompile.  Bisection showed the Gaussian blur diverging from host by up
to 3e-3: TPU lowers f32 `conv_general_dilated` to bf16 MXU passes by
default (the CLAUDE.md dot/einsum rule applies to convs too).  SSIM's
variance is blur(x*x) - mu^2; on a render whose background is a large
constant region the true variance is ~0, the bf16 noise (~1e-3) rivals
C2 = 9e-4, and a noisy NEGATIVE variance flips the denominator's sign —
num/den > 1.  Synthetic random images (variance ~0.08 >> noise) never
trip it, which is why every earlier gate passed.  Fix: precision=HIGHEST
pinned in utils/ssim._blur; scoreboard metrics additionally computed
host-side (utils.ssim.quality_gate) so no device scalar is ever published.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    model_points, render_splats, splat_screen_data,
)
from splat_renderer_tpu.utils.ssim import ssim, ssim_np

N, W, H, BLOCK = 1_000_000, 1920, 1080, 1024


def main() -> None:
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))

    rcfg = RenderConfig(width=W, height=H, base_radius=0.008,
                        tiles_per_splat_cap=4)
    rcfg_turbo = spt.turbo_render_config(W, H, base_radius=0.008,
                                         tiles_per_splat_cap=4)
    pcfg = PointConfig(descent_steps=5)
    cam = spt.Camera(aspect=W / H)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params, key = scene.params(), jax.random.PRNGKey(0)

    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, pcfg, rcfg))(params, key)

    def sized_render(cfg):
        data = jax.jit(lambda s, c: splat_screen_data(s, c, cfg))(
            splats, camera)
        binned = jax.jit(lambda d: bin_splats_packed(d, cfg, BLOCK))(data)
        mt = int(np.asarray(binned["tiles_used"]) * 1.15) + 8
        return jax.jit(lambda s, c: render_splats(
            s, c, cfg, "pallas", BLOCK, blend_max_blocks=mt,
            blend_kernel="tile"))(splats, camera)

    img_exact = sized_render(rcfg)
    img_turbo = sized_render(rcfg_turbo)

    for name, img in (("exact", img_exact), ("turbo", img_turbo)):
        a = np.asarray(jax.device_get(img))
        n_bad = int(np.size(a) - np.isfinite(a).sum())
        print(f"{name}: shape={a.shape} finite_bad={n_bad} "
              f"min={np.nanmin(a):.6f} max={np.nanmax(a):.6f}")

    a_turbo = np.asarray(jax.device_get(img_turbo))
    a_exact = np.asarray(jax.device_get(img_exact))

    s_host = ssim_np(a_turbo, a_exact)
    print(f"host numpy SSIM           = {s_host:.6f}")

    ssim_j = jax.jit(ssim)
    s_dev_args = float(ssim_j(img_turbo, img_exact))
    print(f"device jit(ssim), device args (r02 path) = {s_dev_args:.6f}")

    s_dev_host = float(ssim_j(jnp.asarray(a_turbo), jnp.asarray(a_exact)))
    print(f"device jit(ssim), host-roundtrip args    = {s_dev_host:.6f}")

    # repeat-call stability (transient relay corruption?)
    reps = [float(ssim_j(img_turbo, img_exact)) for _ in range(5)]
    print(f"device jit(ssim) x5 = {['%.6f' % r for r in reps]}")

    # un-jitted device eval (op-by-op dispatch, no single big program)
    s_eager = float(ssim(img_turbo, img_exact))
    print(f"device eager ssim         = {s_eager:.6f}")

    ok = abs(s_dev_args - s_host) < 1e-3 and s_host <= 1.0 + 1e-6
    print(f"VERDICT: host={s_host:.6f} device={s_dev_args:.6f} "
          f"{'AGREE' if ok else 'DIVERGE — relay wrong-scalar through args'}")


if __name__ == "__main__":
    main()
