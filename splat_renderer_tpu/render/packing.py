"""Quantized splat record packing: 36 -> 16 bytes per sorted record.

The sort passes and the blend kernel's DMA traffic scale with record bytes.
Production rasterizers quantize at exactly this boundary (the reference
ultimately writes rgba8unorm pixels, src/ComputeShaderRenderer.ts:197, and
rasterizes on fixed-point hardware); we adopt:

  - screen positions and radii on a 1/32-pixel fixed-point grid (u16)
  - opacity on a u16 grid
  - color on the u8 grid of the output format

`quantize_screen_data` snaps the canonical (N, 8) f32 records onto those
grids.  It is applied to ALL compositors (oracle, XLA tiles, Pallas), so the
grids are pipeline semantics, not a kernel approximation — oracle parity
remains exact.  `pack_records`/record unpacking round-trip the quantized
values bit-exactly (u16/32 and u8 -> f32/255 are reproducible in f32).

Packed layout, 4 x u32 per record:
  [0] sort key (depth bits or tile id; see binning)
  [1] cx_fx (u16 hi? no: lo) | cy_fx << 16     (px * 32, offset +256 px)
  [2] radius_fx (px * 32) | opacity_u16 << 16
  [3] r8 | g8 << 8 | b8 << 16                   (top byte spare)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# fixed-point parameters
POS_SCALE = 32.0  # subpixel grid: 1/32 px
POS_OFFSET = 256.0  # allows centers down to -256 px (clipped splats)
POS_MAX = 65535.0
OPACITY_SCALE = 65535.0
COLOR_SCALE = 255.0


def quantize_screen_data(data: jnp.ndarray) -> jnp.ndarray:
    """Snap the (N, 8) packed screen records onto the pipeline grids.

    Keeps f32 dtype; every compositor consumes this, so quantization is part
    of the rendering semantics (like hardware fixed-point raster grids).
    Invalid splats (non-finite depth) keep radius 0 after clamping.
    """
    cx = jnp.round(jnp.clip((data[:, 0] + POS_OFFSET) * POS_SCALE, 0, POS_MAX))
    cy = jnp.round(jnp.clip((data[:, 1] + POS_OFFSET) * POS_SCALE, 0, POS_MAX))
    r = jnp.round(jnp.clip(data[:, 2] * POS_SCALE, 0, POS_MAX))
    op = jnp.round(jnp.clip(data[:, 3], 0.0, 1.0) * OPACITY_SCALE)
    rgb = jnp.round(jnp.clip(data[:, 4:7], 0.0, 1.0) * COLOR_SCALE)
    return jnp.stack(
        [
            cx / POS_SCALE - POS_OFFSET,
            cy / POS_SCALE - POS_OFFSET,
            r / POS_SCALE,
            op / OPACITY_SCALE,
            rgb[:, 0] / COLOR_SCALE,
            rgb[:, 1] / COLOR_SCALE,
            rgb[:, 2] / COLOR_SCALE,
            data[:, 7],
        ],
        axis=-1,
    )


def pack_records(data_quantized: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(N, 8) quantized f32 -> three u32 payload words (w_pos, w_ro, w_rgb)."""
    # round (not truncate): the quantized f32 values are k/SCALE which may
    # be inexact for the non-power-of-two scales; rounding recovers k exactly
    cx = jnp.round(
        jnp.clip((data_quantized[:, 0] + POS_OFFSET) * POS_SCALE, 0, POS_MAX)
    ).astype(jnp.uint32)
    cy = jnp.round(
        jnp.clip((data_quantized[:, 1] + POS_OFFSET) * POS_SCALE, 0, POS_MAX)
    ).astype(jnp.uint32)
    r = jnp.round(
        jnp.clip(data_quantized[:, 2] * POS_SCALE, 0, POS_MAX)
    ).astype(jnp.uint32)
    op = jnp.round(
        jnp.clip(data_quantized[:, 3] * OPACITY_SCALE, 0, OPACITY_SCALE)
    ).astype(jnp.uint32)
    rgb = jnp.round(
        jnp.clip(data_quantized[:, 4:7] * COLOR_SCALE, 0, COLOR_SCALE)
    ).astype(jnp.uint32)
    w_pos = cx | (cy << 16)
    w_ro = r | (op << 16)
    w_rgb = rgb[:, 0] | (rgb[:, 1] << 8) | (rgb[:, 2] << 16)
    return w_pos, w_ro, w_rgb


def depth_bits(depth: jnp.ndarray) -> jnp.ndarray:
    """f32 depth -> monotonic-order u32 keys (IEEE-754 flip trick, the
    reference's extract-depth-keys.wgsl:55-59).  +inf (invalid) sorts last."""
    bits = jax.lax.bitcast_convert_type(depth, jnp.uint32)
    sign = bits >> 31
    return jnp.where(sign == 1, ~bits, bits | jnp.uint32(0x80000000))


def unpack_words(
    w_pos: jnp.ndarray, w_ro: jnp.ndarray, w_rgb: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Inverse of pack_records; returns (cx, cy, radius, opacity, r, g, b) f32.

    Bit-identical to the quantized f32 values: u16/32 is exact in f32 and the
    color divide matches quantize_screen_data's round(c*255)/255.
    """
    cx = (w_pos & 0xFFFF).astype(jnp.float32) / POS_SCALE - POS_OFFSET
    cy = (w_pos >> 16).astype(jnp.float32) / POS_SCALE - POS_OFFSET
    r = (w_ro & 0xFFFF).astype(jnp.float32) / POS_SCALE
    op = (w_ro >> 16).astype(jnp.float32) / OPACITY_SCALE
    cr = (w_rgb & 0xFF).astype(jnp.float32) / COLOR_SCALE
    cg = ((w_rgb >> 8) & 0xFF).astype(jnp.float32) / COLOR_SCALE
    cb = ((w_rgb >> 16) & 0xFF).astype(jnp.float32) / COLOR_SCALE
    return cx, cy, r, op, cr, cg, cb
