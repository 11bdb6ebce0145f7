"""Tile compositor (pure-XLA v1): per-tile front-to-back alpha blending.

Counterpart of the per-pixel compute compositor
(src/ComputeShaderRenderer.ts:150-198).  The WebGPU shader walks each pixel's
tile list sequentially with an `alpha >= 0.99` break; TPU-natively we walk the
*pair* stream (tile-sorted, depth-ordered within tiles) in chunks under one
`lax.scan`, carrying per-tile-pixel (color, transmittance):

  per chunk (exact, order-preserving):
    alpha   = evaluate chunk splats against their own tile's 16x16 pixels
    t_local = within-chunk segmented exclusive product of (1 - alpha)
    weight  = alpha * t_local * carry_trans[tile]
    color  .at[tile].add(weight * rgb)        # duplicate tiles fold by +
    trans  .at[tile].multiply(1 - alpha)      # duplicate tiles fold by *

Scatter-add/-multiply with duplicate indices are order-independent, so the
result is exactly the sequential front-to-back blend.  The Pallas kernel
(ops/tile_blend.py) is the fast path; this is the readable reference
implementation and the fallback for odd configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .binning import Binned
from .blend import (
    composite_over_background,
    segmented_exclusive_product,
    splat_alpha_planes,
)


def _tile_pixel_offsets(cfg: RenderConfig) -> jnp.ndarray:
    """(tile_pixels, 2) pixel-center offsets within a tile, row-major."""
    tw, th = cfg.tile_w, cfg.tile_h
    py = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
    return jnp.stack([px + 0.5, py + 0.5], axis=-1).reshape(-1, 2)


def tiles_to_image(
    tile_color: jnp.ndarray,  # (num_tiles, tile_pixels, 3)
    tile_alpha: jnp.ndarray,  # (num_tiles, tile_pixels)
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Assemble per-tile pixel blocks into the (H, W, 3) image (cropping the
    partial tiles at the right/bottom edges) and composite the background."""
    tw, th = cfg.tile_w, cfg.tile_h
    img = composite_over_background(tile_color, tile_alpha, cfg)
    img = img.reshape(cfg.tiles_y, cfg.tiles_x, th, tw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(cfg.tiles_y * th, cfg.tiles_x * tw, 3)
    return img[: cfg.height, : cfg.width]


def tiles_to_plane(tile_vals: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Assemble per-tile (T, tile_pixels) scalar planes into (H, W) —
    tiles_to_image's single-channel twin (depth/alpha G-buffer channels)."""
    tw, th = cfg.tile_w, cfg.tile_h
    img = tile_vals.reshape(cfg.tiles_y, cfg.tiles_x, th, tw)
    img = img.transpose(0, 2, 1, 3).reshape(cfg.tiles_y * th, cfg.tiles_x * tw)
    return img[: cfg.height, : cfg.width]


def render_tiles(
    splat_data_sorted: jnp.ndarray,  # (N, 10) depth-ascending packed data
    binned: Binned,
    cfg: RenderConfig,
    pair_chunk: int = 1024,
    return_tiles: bool = False,
    differentiable: bool = False,
    return_aux: bool = False,
) -> jnp.ndarray:
    """Composite the binned splats; returns the (H, W, 3) image, or the
    per-tile premultiplied partials (tile_color (T, tp, 3), tile_alpha
    (T, tp)) with return_tiles=True — the layer format of blend.over_merge
    (splat-parallel band compositing combines these across devices).

    differentiable=True (render/diff.py's tiles path) carries transmittance
    in LOG space so the per-chunk fold is a scatter-ADD (scatter-multiply
    with duplicate indices has no JAX gradient rule): forward results agree
    with the default path to fp roundoff (one log/exp per (chunk, tile)
    factor, ~1e-7 relative), and alpha is clamped below 1 by 1e-7 so the log
    stays finite — an opaque-saturated pixel's transmittance bottoms out at
    ~1e-7 per contributing splat instead of exactly 0.

    return_aux=True (render_gbuffer) additionally accumulates the
    alpha-weighted depth sum_i w_i d_i (w_i = the same over-blend weights
    the color uses, d_i = the record's quantized camera distance) and
    returns (image, depth_acc (H, W), alpha (H, W)) — the G-buffer
    channels.  depth_acc is premultiplied; normalize by alpha for the
    expected-hit depth (render_gbuffer does)."""
    num_tiles = cfg.num_tiles
    tp = cfg.tile_pixels
    pair_tile = binned["pair_tile"]
    pair_splat = binned["pair_splat"]
    p = pair_tile.shape[0]

    pad = (-p) % pair_chunk
    if pad:
        pair_tile = jnp.concatenate(
            [pair_tile, jnp.full((pad,), num_tiles, pair_tile.dtype)]
        )
        pair_splat = jnp.concatenate([pair_splat, jnp.zeros((pad,), pair_splat.dtype)])
    n_chunks = pair_tile.shape[0] // pair_chunk
    tiles_c = pair_tile.reshape(n_chunks, pair_chunk)
    splats_c = pair_splat.reshape(n_chunks, pair_chunk)

    pix_off = _tile_pixel_offsets(cfg)  # (tp, 2)
    pox = pix_off[:, 0]  # (tp,) planes — the (c, tp, 2) pixel broadcast
    poy = pix_off[:, 1]  # lane-pads 2 -> 128 on TPU (blend.splat_alpha note)
    tw, th = float(cfg.tile_w), float(cfg.tile_h)

    def body(carry, inputs):
        color, trans, depth = carry  # (T+1, tp, 3), (T+1, tp), (T+1, tp)|()
        tile_ids, splat_ids = inputs  # (c,), (c,)
        data = splat_data_sorted[splat_ids]  # (c, 10)
        origin_x = (tile_ids % cfg.tiles_x).astype(jnp.float32) * tw  # (c,)
        origin_y = (tile_ids // cfg.tiles_x).astype(jnp.float32) * th
        pxc = origin_x[:, None] + pox[None, :]  # (c, tp)
        pyc = origin_y[:, None] + poy[None, :]
        a = splat_alpha_planes(
            data[:, 0:1], data[:, 1:2], data[:, 2:3], data[:, 3:4],
            data[:, 8:9], data[:, 9:10], pxc, pyc, cfg,
        )  # (c, tp)
        a = jnp.where((tile_ids < num_tiles)[:, None], a, 0.0)

        starts = jnp.concatenate(
            [jnp.ones((1,), bool), tile_ids[1:] != tile_ids[:-1]]
        )
        if differentiable:
            a = jnp.minimum(a, 1.0 - 1e-7)  # keep log1p finite (see docstring)
        t_local = segmented_exclusive_product(1.0 - a, starts)  # (c, tp)
        trans_carry = jnp.exp(trans)[tile_ids] if differentiable else trans[tile_ids]
        weight = a * t_local * trans_carry  # (c, tp)
        rgb = data[:, 4:7]
        color = color.at[tile_ids].add(weight[:, :, None] * rgb[:, None, :])
        if return_aux:
            depth = depth.at[tile_ids].add(weight * data[:, 7:8])
        if differentiable:
            trans = trans.at[tile_ids].add(jnp.log1p(-a))
        else:
            trans = trans.at[tile_ids].multiply(1.0 - a)
        return (color, trans, depth), None

    init = (
        jnp.zeros((num_tiles + 1, tp, 3), jnp.float32),
        jnp.zeros((num_tiles + 1, tp), jnp.float32)
        if differentiable
        else jnp.ones((num_tiles + 1, tp), jnp.float32),
        jnp.zeros((num_tiles + 1, tp), jnp.float32)
        if return_aux
        else jnp.zeros((), jnp.float32),
    )
    (color, trans, depth), _ = jax.lax.scan(body, init, (tiles_c, splats_c))
    if differentiable:
        trans = jnp.exp(trans)
    if return_tiles:
        return color[:num_tiles], 1.0 - trans[:num_tiles]
    img = tiles_to_image(color[:num_tiles], 1.0 - trans[:num_tiles], cfg)
    if return_aux:
        return (
            img,
            tiles_to_plane(depth[:num_tiles], cfg),
            tiles_to_plane(1.0 - trans[:num_tiles], cfg),
        )
    return img
