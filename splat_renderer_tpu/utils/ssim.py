"""SSIM and the 3DGS training loss ((1-lam)*L1 + lam*(1-SSIM)).

The WebGPU reference is forward-only and has no loss of any kind; this
module exists for the rebuild's inverse-rendering stack (fit.py), where the
de-facto standard objective of Gaussian-splat fitting (Kerbl et al. 2023,
sec. 3 "Optimization") is the L1 / D-SSIM mix with lambda = 0.2.

SSIM follows Wang et al. 2004 with the common 11x11 Gaussian window
(sigma 1.5) and SAME zero padding, computed per channel and averaged —
the convention of the original 3DGS trainer.  TPU notes:

- the window is separable: two depthwise 1-D convolutions ((1,11) then
  (11,1)) instead of one 11x11 — 11x fewer multiplies, and XLA lowers each
  to a lane-aligned reduce-window-style program.
- channels ride the conv BATCH axis ((3, 1, H, W)): a feature_group_count=3
  depthwise conv at C=3 would pad channels toward the 128-lane tile
  (CLAUDE.md plane rule); batch=3 keeps H, W on the vector lanes.
- everything is plain multiply/add/divide on (3,1,H,W) blocks, fully
  differentiable — `jax.grad` of dssim_l1 flows to both images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_WINDOW = 11
_SIGMA = 1.5
_C1 = 0.01**2  # (k1 * max_val)^2, max_val = 1.0
_C2 = 0.03**2


def _gauss_kernel() -> jnp.ndarray:
    x = jnp.arange(_WINDOW, dtype=jnp.float32) - (_WINDOW - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * _SIGMA**2))
    return g / jnp.sum(g)


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur of (B, 1, H, W), SAME zero padding.

    precision=HIGHEST is LOAD-BEARING: TPU lowers f32 convs to bf16 MXU
    passes by default (~1e-3 error — CLAUDE.md perf rules).  In SSIM the
    variance is computed as blur(x*x) - mu^2; on images with near-flat
    regions (a render's constant background) the true variance is ~0, the
    bf16 noise is comparable to C2 = 9e-4, and a negative noisy variance
    flips the denominator's sign — producing impossible SSIM > 1
    (BENCH_r02's 1.2312; reproduced + bisected in
    benchmarks/probe_ssim_device.py)."""
    g = _gauss_kernel()
    kx = g.reshape(1, 1, 1, _WINDOW)
    ky = g.reshape(1, 1, _WINDOW, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME",
                                     dimension_numbers=dn, precision=hi)
    return jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME",
                                        dimension_numbers=dn, precision=hi)


def _chan_first(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) or (H, W) -> (C, 1, H, W) conv layout."""
    if img.ndim == 2:
        return img[None, None]
    return jnp.moveaxis(img, -1, 0)[:, None]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM of two images in [0, 1] — (H, W, 3) or (H, W) -> scalar.

    Matches the original 3DGS trainer's convention (11x11 Gaussian window,
    sigma 1.5, SAME zero padding, per-channel mean); differentiable in both
    arguments.
    """
    x = _chan_first(jnp.asarray(img1, jnp.float32))
    y = _chan_first(jnp.asarray(img2, jnp.float32))
    mu_x, mu_y = _blur(x), _blur(y)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    var_x = _blur(x * x) - mu_xx
    var_y = _blur(y * y) - mu_yy
    cov = _blur(x * y) - mu_xy
    num = (2.0 * mu_xy + _C1) * (2.0 * cov + _C2)
    den = (mu_xx + mu_yy + _C1) * (var_x + var_y + _C2)
    return jnp.mean(num / den)


def ssim_np(img1, img2) -> float:
    """Host-side (pure numpy) mean SSIM — the SCOREBOARD implementation.

    Same convention as :func:`ssim` (11x11 Gaussian, sigma 1.5, SAME zero
    padding, per-channel mean), but computed entirely on the host so a
    device/relay miscompile of a jitted scalar reduction can never corrupt
    a published quality metric (BENCH_r02 shipped ssim_turbo_vs_exact =
    1.2312, which is impossible for in-range inputs — see NOTES.md round 3).
    bench.py and drive_tpu_parity.py call THIS after `device_get` + range
    asserts; the jax `ssim` stays for differentiable losses only.
    """
    import numpy as np

    x = np.asarray(img1, np.float64)
    y = np.asarray(img2, np.float64)
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch {x.shape} vs {y.shape}")
    if not (np.isfinite(x).all() and np.isfinite(y).all()):
        raise ValueError("non-finite pixels in SSIM input")
    if x.ndim == 2:
        x, y = x[None], y[None]
    else:
        x, y = np.moveaxis(x, -1, 0), np.moveaxis(y, -1, 0)

    # window recomputed in numpy: no device call may touch the scoreboard
    xs = np.arange(_WINDOW, dtype=np.float64) - (_WINDOW - 1) / 2.0
    g = np.exp(-(xs**2) / (2.0 * _SIGMA**2))
    g /= g.sum()

    def blur(a):  # separable SAME-zero-padded Gaussian over (C, H, W)
        pad = (_WINDOW - 1) // 2
        b = np.apply_along_axis(
            lambda r: np.convolve(np.pad(r, pad), g, mode="valid"), 1, a
        )
        return np.apply_along_axis(
            lambda r: np.convolve(np.pad(r, pad), g, mode="valid"), 2, b
        )

    mu_x, mu_y = blur(x), blur(y)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    var_x = blur(x * x) - mu_xx
    var_y = blur(y * y) - mu_yy
    cov = blur(x * y) - mu_xy
    num = (2.0 * mu_xy + _C1) * (2.0 * cov + _C2)
    den = (mu_xx + mu_yy + _C1) * (var_x + var_y + _C2)
    return float(np.mean(num / den))


def quality_gate(img, exact, lo: float = -1e-4, hi: float = 1.0 + 1e-4) -> float:
    """Range-asserted host SSIM for published metrics.

    Asserts both images are finite and inside the blend algebra's guaranteed
    [0, 1] output range (over-compositing of [0,1] colors over a [0,1]
    background cannot leave it), then returns host SSIM and hard-asserts the
    result is <= 1 + 1e-6.  Raises AssertionError with the offending stats —
    an impossible quality number must kill the bench, never ship.
    """
    import numpy as np

    for name, a in (("img", np.asarray(img)), ("exact", np.asarray(exact))):
        if not np.isfinite(a).all():
            raise AssertionError(f"{name}: non-finite pixels "
                                 f"(n={np.size(a) - np.isfinite(a).sum()})")
        mn, mx = float(a.min()), float(a.max())
        if mn < lo or mx > hi:
            raise AssertionError(f"{name}: pixel range [{mn}, {mx}] outside "
                                 f"[{lo}, {hi}] — out-of-range render output")
    s = ssim_np(img, exact)
    if not (-1.0 - 1e-6 <= s <= 1.0 + 1e-6):
        raise AssertionError(f"SSIM {s} outside [-1, 1] — metric corrupt")
    return s


def dssim_l1(
    img: jnp.ndarray, target: jnp.ndarray, lam: float = 0.2
) -> jnp.ndarray:
    """The 3DGS fitting objective: (1-lam)*L1 + lam*(1 - SSIM), lam=0.2."""
    l1 = jnp.mean(jnp.abs(img - target))
    return (1.0 - lam) * l1 + lam * (1.0 - ssim(img, target))


def image_loss(name: str):
    """Loss registry for fit.py: name -> fn(img, target) -> scalar.

    "l2" (MSE, the simple default), "l1", "ssim" (the 3DGS L1/D-SSIM mix).
    """
    losses = {
        "l2": lambda a, b: jnp.mean((a - b) ** 2),
        "l1": lambda a, b: jnp.mean(jnp.abs(a - b)),
        "ssim": dssim_l1,
    }
    if name not in losses:
        raise ValueError(f"unknown loss {name!r} (use one of {sorted(losses)})")
    return losses[name]
