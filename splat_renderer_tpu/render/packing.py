"""Quantized splat record packing: the 16-byte sorted-record format.

The sort passes and the blend kernel's DMA traffic scale with record bytes.
Production rasterizers quantize at exactly this boundary (the reference
ultimately writes rgba8unorm pixels, src/ComputeShaderRenderer.ts:197, and
rasterizes on fixed-point hardware); we adopt:

  - screen positions and radii on a fixed-point subpixel grid (u16) sized to
    the frame: 1/cfg.pos_scale px, the finest power-of-two grid (up to 1/32)
    whose u16 range covers the whole frame plus the -256 px clip margin
  - color and opacity on the u8 grid of the output format
  - ellipse angle on a u8 grid (1.4 degree steps), minor/major ratio on u8

`quantize_screen_data` snaps the canonical (N, 10) f32 records onto those
grids.  It is applied to ALL compositors (oracle, XLA tiles, Pallas), so the
grids are pipeline semantics, not a kernel approximation — oracle parity
remains exact.  `pack_records`/`unpack_words` round-trip the quantized values
bit-exactly.

Packed payload, 3 x u32 per record (the tile/depth sort keys ride separately):
  w_pos: cx_fx (u16, px*pos_scale, offset +256 px) | cy_fx << 16
  w_ro:  radius_fx (u16, px*pos_scale) | angle_u8 << 16 | ratio_u8 << 24
  w_rgb: r8 | g8 << 8 | b8 << 16 | opacity_u8 << 24
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig

# fixed-point parameters (position grid scale/offset live on RenderConfig:
# cfg.pos_scale is frame-sized, cfg.pos_offset = 256 px)
POS_MAX = 65535.0
COLOR_SCALE = 255.0
ANGLE_SCALE = 255.0 / (2.0 * math.pi)  # angle+pi -> [0, 255]
RATIO_SCALE = 255.0
# Dequantization uses MULTIPLY by these reciprocal constants, never a divide:
# Mosaic's and XLA's divides round differently by ulps, and any dequant ulp
# that reaches the hard support cutoff flips pixels between compositors
# (round-2 parity gate).  Multiplies by an identical f32 constant are
# bit-identical across backends.  (Position grids are power-of-two scales,
# where divide would be exact anyway — unified on multiply for uniformity.)
INV_COLOR_SCALE = 1.0 / 255.0
INV_ANGLE_SCALE = 2.0 * math.pi / 255.0
INV_RATIO_SCALE = 1.0 / 255.0


def quantize_screen_data(data: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Snap the (N, 10) packed screen records onto the pipeline grids.

    Record: [cx, cy, radius, opacity, r, g, b, depth, angle, ratio].
    Keeps f32 dtype; every compositor consumes this, so quantization is part
    of the rendering semantics (like hardware fixed-point raster grids).
    """
    ps, po = cfg.pos_scale, cfg.pos_offset
    cx = jnp.round(jnp.clip((data[:, 0] + po) * ps, 0, POS_MAX))
    cy = jnp.round(jnp.clip((data[:, 1] + po) * ps, 0, POS_MAX))
    r = jnp.round(jnp.clip(data[:, 2] * ps, 0, POS_MAX))
    op = jnp.round(jnp.clip(data[:, 3], 0.0, 1.0) * COLOR_SCALE)
    rgb = jnp.round(jnp.clip(data[:, 4:7], 0.0, 1.0) * COLOR_SCALE)
    ang = jnp.round((data[:, 8] + math.pi) * ANGLE_SCALE) % 256.0
    ratio = jnp.round(jnp.clip(data[:, 9], 1.0 / RATIO_SCALE, 1.0) * RATIO_SCALE)
    inv_ps = 1.0 / ps
    return jnp.stack(
        [
            cx * inv_ps - po,
            cy * inv_ps - po,
            r * inv_ps,
            op * INV_COLOR_SCALE,
            rgb[:, 0] * INV_COLOR_SCALE,
            rgb[:, 1] * INV_COLOR_SCALE,
            rgb[:, 2] * INV_COLOR_SCALE,
            data[:, 7],
            ang * INV_ANGLE_SCALE - math.pi,
            ratio * INV_RATIO_SCALE,
        ],
        axis=-1,
    )


def pack_records(
    data_quantized: jnp.ndarray, cfg: RenderConfig
) -> Tuple[jnp.ndarray, ...]:
    """(N, 10) quantized f32 -> three u32 payload words (w_pos, w_ro, w_rgb).

    Uses round (not truncate): the quantized f32 values are k/SCALE which may
    be inexact for non-power-of-two scales; rounding recovers k exactly.
    """
    q = data_quantized
    ps, po = cfg.pos_scale, cfg.pos_offset
    cx = jnp.round(jnp.clip((q[:, 0] + po) * ps, 0, POS_MAX)).astype(jnp.uint32)
    cy = jnp.round(jnp.clip((q[:, 1] + po) * ps, 0, POS_MAX)).astype(jnp.uint32)
    r = jnp.round(jnp.clip(q[:, 2] * ps, 0, POS_MAX)).astype(jnp.uint32)
    op = jnp.round(jnp.clip(q[:, 3] * COLOR_SCALE, 0, COLOR_SCALE)).astype(jnp.uint32)
    rgb = jnp.round(jnp.clip(q[:, 4:7] * COLOR_SCALE, 0, COLOR_SCALE)).astype(
        jnp.uint32
    )
    ang = jnp.round((q[:, 8] + math.pi) * ANGLE_SCALE).astype(jnp.uint32) % 256
    ratio = jnp.round(jnp.clip(q[:, 9] * RATIO_SCALE, 1, RATIO_SCALE)).astype(
        jnp.uint32
    )
    w_pos = cx | (cy << 16)
    w_ro = r | (ang << 16) | (ratio << 24)
    w_rgb = rgb[:, 0] | (rgb[:, 1] << 8) | (rgb[:, 2] << 16) | (op << 24)
    return w_pos, w_ro, w_rgb


def depth_bits(depth: jnp.ndarray) -> jnp.ndarray:
    """f32 depth -> monotonic-order u32 keys (IEEE-754 flip trick, the
    reference's extract-depth-keys.wgsl:55-59).  +inf (invalid) sorts last."""
    bits = jax.lax.bitcast_convert_type(depth, jnp.uint32)
    sign = bits >> 31
    return jnp.where(sign == 1, ~bits, bits | jnp.uint32(0x80000000))


def unpack_words(
    w_pos: jnp.ndarray, w_ro: jnp.ndarray, w_rgb: jnp.ndarray, cfg: RenderConfig
) -> Tuple[jnp.ndarray, ...]:
    """Inverse of pack_records.

    Returns (cx, cy, radius, opacity, r, g, b, angle, ratio) f32 —
    bit-identical to the quantized f32 values."""
    ps, po = cfg.pos_scale, cfg.pos_offset
    inv_ps = 1.0 / ps
    cx = (w_pos & 0xFFFF).astype(jnp.float32) * inv_ps - po
    cy = (w_pos >> 16).astype(jnp.float32) * inv_ps - po
    r = (w_ro & 0xFFFF).astype(jnp.float32) * inv_ps
    ang = ((w_ro >> 16) & 0xFF).astype(jnp.float32) * INV_ANGLE_SCALE - math.pi
    ratio = (w_ro >> 24).astype(jnp.float32) * INV_RATIO_SCALE
    cr = (w_rgb & 0xFF).astype(jnp.float32) * INV_COLOR_SCALE
    cg = ((w_rgb >> 8) & 0xFF).astype(jnp.float32) * INV_COLOR_SCALE
    cb = ((w_rgb >> 16) & 0xFF).astype(jnp.float32) * INV_COLOR_SCALE
    op = (w_rgb >> 24).astype(jnp.float32) * INV_COLOR_SCALE
    return cx, cy, r, op, cr, cg, cb, ang, ratio
