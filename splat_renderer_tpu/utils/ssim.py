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
    """Separable 11x11 Gaussian blur of (B, 1, H, W), SAME zero padding."""
    g = _gauss_kernel()
    kx = g.reshape(1, 1, 1, _WINDOW)
    ky = g.reshape(1, 1, _WINDOW, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn)
    return jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn)


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
