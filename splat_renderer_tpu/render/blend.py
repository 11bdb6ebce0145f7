"""Shared splat evaluation + front-to-back blending math.

The single source of truth for "what does one splat contribute to one pixel",
used by the sequential oracle, the XLA tile compositor, and (re-derived in
kernel form) the Pallas tile blend.  Counterpart of `evaluateSplat`
(src/ComputeShaderRenderer.ts:97-148) and the blending recurrence (:176-191).

Key TPU insight: the front-to-back "over" operator
    (C_a, T_a) (+) (C_b, T_b) = (C_a + T_a * C_b, T_a * T_b)
is **associative**, so compositing needs no per-pixel sequential loop: within
any ordered run of splats, transmittance is an (exclusive) cumulative product
and color a weighted sum.  The reference's per-pixel `for` loop with an
`alpha >= 0.99` break becomes chunked scans with saturation predicates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig

# splat screen-data record layout (see projector.splat_screen_records):
# [0] center x  [1] center y  [2] screen radius (major axis)  [3] opacity
# [4:7] lit rgb [7] depth  [8] ellipse angle (rad)  [9] minor/major ratio
DATA_DIM = 10


def ellipse_cos_sin(angle: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin of the quantized ellipse angle by a FIXED polynomial.

    The support cutoff `nd2 <= margin^2` is a hard threshold: any ulp-level
    difference in the rotated distance between two compositors flips boundary
    pixels and the alpha jumps by exp(-margin^2/(2 sigma^2)) ~ 0.011 (measured
    on-TPU, round 2).  Backend `cos`/`sin` (libm on CPU, Mosaic approx on TPU)
    differ by ulps, so every compositor must run the SAME arithmetic: these
    odd/even minimax polynomials (|err| < 2e-7 on [-pi, pi], far below the u8
    angle grid of render/packing.py) are IEEE mul/add chains that produce
    bit-identical results on every backend.
    """
    x = angle  # in [-pi, pi] from the u8 grid
    x2 = x * x
    # sin: degree-11 odd least-squares fit on [-pi, pi], |err| < 3.1e-7
    s = x * (
        9.999997070e-01
        + x2 * (
            -1.666657722e-01
            + x2 * (
                8.332558118e-03
                + x2 * (-1.981257552e-04 + x2 * (2.704051213e-06 + x2 * -2.053424453e-08))
            )
        )
    )
    # cos: degree-12 even least-squares fit on [-pi, pi], |err| < 3.6e-8
    c = 9.999999923e-01 + x2 * (
        -4.999999177e-01
        + x2 * (
            4.166652436e-02
            + x2 * (
                -1.388797039e-03
                + x2 * (2.477342375e-05 + x2 * (-2.711336876e-07 + x2 * 1.736911667e-09))
            )
        )
    )
    return c, s


def splat_alpha(
    data: jnp.ndarray,  # (..., 10)
    pix: jnp.ndarray,  # (..., 2) broadcastable against data[..., :2]
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Per-(splat, pixel) alpha contribution — record-array wrapper over
    splat_alpha_planes (see there for semantics and reference citations).

    NOTE: the (..., 10) record / (..., 2) pixel broadcasting form lane-pads
    the trailing dims toward 128 on TPU; hot loops (oracle, compositor) call
    splat_alpha_planes with per-field planes instead.  Both are the same op
    sequence, so results are bit-equal."""
    return splat_alpha_planes(
        data[..., 0], data[..., 1], data[..., 2], data[..., 3],
        data[..., 8], data[..., 9],
        pix[..., 0], pix[..., 1], cfg,
    )


def splat_alpha_planes(
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    radius: jnp.ndarray,
    opacity: jnp.ndarray,
    angle: jnp.ndarray,
    ratio: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Per-(splat, pixel) alpha from broadcastable per-field planes.

    Matches evaluateSplat (src/ComputeShaderRenderer.ts:97-148):
    - reject pixels outside the padded bounds box (:117-121)
    - reject splats with screen radius < 0.5 px (:127-129)
    - radial Gaussian: exp(-0.5 * (d/r)^2 / sigma^2) with sigma=0.5 (:136-140)
    - multiplied by per-splat opacity (the reference reads but drops opacity in
      this shader; its property pass sets opacity=1.0 so the behaviors agree —
      we keep the multiply so opacity is honored, matching TileRenderer).

    Extensions over the reference's isotropic footprint:
    - anisotropy: the squared distance is measured in the splat's screen
      ellipse frame (rotate by -angle, divide the minor component by ratio) —
      the screen-space shape of a surface-oriented splat seen at an angle
      (the reference's live path renders oriented quads, src/Renderer.ts:90-117;
      its splat path is isotropic, which is the ratio=1 special case).
    - cfg.opaque: hard coverage (alpha = opacity inside the ellipse) — the
      z-buffer semantics of the reference's opaque quad renderer
      (src/Renderer.ts:189-201): with front-to-back blending, the nearest
      covering splat wins exactly.
    """
    dx = px - cx
    dy = py - cy
    big_enough = radius >= cfg.min_screen_radius

    # The hard support cutoff below must decide IDENTICALLY in every
    # compositor (XLA-CPU, XLA-TPU, Mosaic).  Mul/add chains lower
    # bit-identically across those backends (the round-2 polynomial-trig fix
    # proved this); DIVIDES / RECIPROCALS do NOT — Mosaic's divide differs by
    # ulps, and one ulp across the cutoff flips a pixel's alpha by up to
    # ~opacity*exp(-margin^2/(2 sigma^2)) (measured 5.5e-4 image diffs,
    # round-2 parity gate).  So the CUTOFF COMPARISON is all-multiply
    # (dist2 <= margin2 * scale2); the division survives only inside the
    # exp() argument, where an ulp perturbs alpha by ~1e-7.
    if cfg.oriented:
        rr = jnp.maximum(ratio, 1e-3)
        # same fixed-polynomial trig as the Pallas kernel
        ca, sa = ellipse_cos_sin(angle)
        # foreshortening acts ALONG the angle direction (the surface normal's
        # screen projection): that component is divided by the minor/major
        # ratio.  Multiplying the whole metric through by ratio^2 keeps the
        # cutoff divide-free: (u/ratio)^2 + v^2 <= m^2 r^2 <=>
        # u^2 + (v ratio)^2 <= m^2 (r ratio)^2.
        u = ca * dx + sa * dy
        vr = (-sa * dx + ca * dy) * rr
        dist2 = u * u + vr * vr
        scale = radius * rr
    else:
        # isotropic path: NO rotation, even though the quantized angle grid
        # has no exact zero (angle 0 quantizes to pi/255) — a rotated distance
        # differs by ~1e-7 relative fp error, which flips pixels across the
        # hard cutoff below (measured 0.015 diffs on-TPU, round 2).  Must stay
        # the exact op sequence of the kernel's isotropic branch.
        dist2 = dx * dx + dy * dy
        scale = radius

    scale2 = scale * scale
    # exp ARGUMENT only: the normalized distance is folded into ONE
    # record-scale coefficient coef = -1/(2 sigma^2 scale^2), so the hot
    # panel path pays a single multiply where a (splat, pixel)-scale divide
    # plus a multiply used to live (the divide moves to record scale —
    # measured ~1.5 ms/frame at 1M @1080p, round 3).  A backend-ulp in the
    # reciprocal perturbs alpha by ~1e-7, far under the 2e-5 parity gates;
    # the support CUTOFF below stays all-multiply and is untouched.
    coef = (-0.5 / (cfg.sigma * cfg.sigma)) / jnp.maximum(scale2, 1e-12)
    # Support cutoff: the reference tests the padded bounds BOX (1.5r,
    # src/ComputeShaderRenderer.ts:117-121); we cut at the inscribed DISC of
    # the same 1.5r support — the dropped box corners carry alpha <=
    # exp(-0.5*(1.5*sqrt(2)/sigma)^2) ~ 1e-4, and a single compare replaces
    # four abs/compare lanes in the hot kernel.  Applied uniformly (oracle
    # included), so parity is exact.
    margin2 = cfg.bounds_margin * cfg.bounds_margin
    if cfg.opaque and cfg.quad:
        # the reference's live path draws FULL squares (src/Renderer.ts:
        # 95-131; the fragment never discards on uv): coverage is the
        # screen-frame square with the ellipse's half-extents — minor
        # radius*ratio ALONG the angle direction (u), major radius across
        # (v).  In the ratio-scaled metric both compares collapse to scale2:
        # |u| <= r*rr <=> u^2 <= scale2;  |v| <= r <=> (v*rr)^2 <= scale2.
        if cfg.oriented:
            inside = (u * u <= scale2) & (vr * vr <= scale2)
        else:
            inside = (dx * dx <= scale2) & (dy * dy <= scale2)
        shape = jnp.where(inside, 1.0, 0.0)
    elif cfg.opaque:
        shape = jnp.where(dist2 <= scale2, 1.0, 0.0)
    else:
        shape = jnp.where(
            dist2 <= margin2 * scale2,
            jnp.exp(dist2 * coef),
            0.0,
        )
    return jnp.where(big_enough, opacity * shape, 0.0)


def segmented_exclusive_product(
    values: jnp.ndarray,  # (n, ...) per-element factors (e.g. 1 - alpha)
    starts: jnp.ndarray,  # (n,) bool, True where a new segment begins
) -> jnp.ndarray:
    """Exclusive running product within contiguous segments along axis 0.

    out[i] = prod(values[j] for j in segment(i), j < i).  Implemented as an
    inclusive associative scan of right-shifted values with segment-reset
    flags — exact products, no log/exp round-tripping.
    """
    n = values.shape[0]
    ones_head = jnp.ones_like(values[:1])
    shifted = jnp.concatenate([ones_head, values[:-1]], axis=0)
    shifted = jnp.where(
        starts.reshape((n,) + (1,) * (values.ndim - 1)), 1.0, shifted
    )

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(
            fb.reshape(fb.shape + (1,) * (va.ndim - fb.ndim)), vb, va * vb
        )

    _, prod = jax.lax.associative_scan(combine, (starts, shifted))
    return prod


def over_merge(
    color_a: jnp.ndarray,
    alpha_a: jnp.ndarray,
    color_b: jnp.ndarray,
    alpha_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two premultiplied (color, alpha) layers with A in front of B.

    This is the associative 'over' fold used to combine depth-ordered partial
    composites — e.g. per-device shards in splat-parallel rendering."""
    t_a = 1.0 - alpha_a
    return color_a + t_a[..., None] * color_b, alpha_a + t_a * alpha_b


def composite_over_background(
    color: jnp.ndarray, alpha: jnp.ndarray, cfg: RenderConfig
) -> jnp.ndarray:
    """final = accumulated + bg * (1 - alpha) (src/ComputeShaderRenderer.ts:193-197)."""
    bg = jnp.asarray(cfg.background, color.dtype)
    return color + bg * (1.0 - alpha)[..., None]
