"""Sort-based tile binning: depth sort + stable tile-key sort.

Replaces four reference components at once — RadixSorter (+ DepthKeyExtractor
front-end), GPUTileBinner's count/fill atomic passes, PrefixSumScanner, and
PerTileSorter (SURVEY.md section 7 "Design translation"):

- WebGPU: radix-sort splats by depth, atomicAdd-count tile overlaps, readback
  total, prefix-sum offsets, atomicAdd-fill lists (order only approximately
  sorted across workgroups — SURVEY.md section 3.3 footnote).
- TPU (no atomics, static shapes): sort splats by depth once; expand each
  splat into (tile, splat) pairs with a static per-splat capacity; stable-sort
  pairs by tile id.  Stability makes per-tile runs **exactly** depth-ordered
  by construction.  Offsets are a searchsorted over the sorted keys — the
  reference's scan-size cliff (CPU fallback above 512 tiles,
  src/PrefixSumScanner.ts:80-87) does not exist.

The single GPU->CPU readback the reference kept (sizing the tile-index buffer,
src/GPUTileBinner.ts:244-263) is gone by construction: capacity = N * cap.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig

Binned = Dict[str, jnp.ndarray]


def depth_sort(depth: jnp.ndarray, *arrays: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Sort companion arrays by ascending depth (front-to-back — the
    convention of the reference's current GPU chain,
    src/shaders/extract-depth-keys.wgsl:52-62, resolving SURVEY.md section 2.4
    item 3 in favor of front-to-back 'over' with early-out).

    No IEEE-754 key bit-twiddling needed: XLA's sort handles f32 (inf-keyed
    invalids sort last, like the reference's 0xFFFFFFFF padding).
    """
    n = depth.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    sorted_depth, order = jax.lax.sort_key_val(depth, iota, is_stable=True)
    return (sorted_depth, order) + tuple(a[order] for a in arrays)


def _tile_footprint(
    splat_data: jnp.ndarray,  # (N, 8) packed screen data (see blend.py)
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clamped tile ranges (tx0, ty0, w, h) per splat.

    Bounds = center +- bounds_margin * radius (src/SplatProjector.ts:115-121).
    Footprints larger than cfg.tiles_per_splat_cap tiles are shrunk toward the
    splat's center tile (capacity-bounded expansion; the reference merely
    warns on pathological overlap, src/GPUTileBinner.ts:265-281).  Splats
    below min_screen_radius contribute nothing anywhere
    (src/ComputeShaderRenderer.ts:127-129), so they are dropped here.
    """
    center = splat_data[:, 0:2]
    radius = splat_data[:, 2]
    depth = splat_data[:, 7]
    pad = radius * cfg.bounds_margin
    bmin = center - pad[:, None]
    bmax = center + pad[:, None]

    ts = float(cfg.tile_size)
    tx0 = jnp.clip(jnp.floor(bmin[:, 0] / ts), 0, cfg.tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(bmin[:, 1] / ts), 0, cfg.tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(bmax[:, 0] / ts), 0, cfg.tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(bmax[:, 1] / ts), 0, cfg.tiles_y - 1).astype(jnp.int32)

    alive = (
        jnp.isfinite(depth)
        & (radius >= cfg.min_screen_radius)
        & (bmax[:, 0] >= 0)
        & (bmax[:, 1] >= 0)
        & (bmin[:, 0] < cfg.width)
        & (bmin[:, 1] < cfg.height)
    )

    w = tx1 - tx0 + 1
    h = ty1 - ty0 + 1
    cap = cfg.tiles_per_splat_cap
    # shrink to <= cap tiles, keeping the window centered on the center tile
    w_c = jnp.minimum(w, cap)
    h_c = jnp.minimum(h, jnp.maximum(cap // jnp.maximum(w_c, 1), 1))
    ctx = jnp.clip(jnp.floor(center[:, 0] / ts), 0, cfg.tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(center[:, 1] / ts), 0, cfg.tiles_y - 1).astype(jnp.int32)
    tx0 = jnp.clip(ctx - (w_c - 1) // 2, tx0, tx1 - w_c + 1)
    ty0 = jnp.clip(cty - (h_c - 1) // 2, ty0, ty1 - h_c + 1)

    w_c = jnp.where(alive, w_c, 0)
    h_c = jnp.where(alive, h_c, 0)
    return tx0, ty0, w_c, h_c


def bin_splats(splat_data_sorted: jnp.ndarray, cfg: RenderConfig) -> Binned:
    """Bin depth-sorted splats into per-tile runs.

    `splat_data_sorted` (N, 8) must already be in ascending-depth order (see
    `depth_sort`).  Returns:
      - pair_splat (P,) int32: index (into the depth-sorted splat arrays) of
        the splat owning each pair; P = N * tiles_per_splat_cap.  Within each
        tile's run, pairs are exactly front-to-back.
      - pair_tile (P,) int32: owning tile id; num_tiles for inactive slots
        (they sort to the tail).
      - offsets (num_tiles + 1,) int32: run boundaries into the pair arrays.
      - counts (num_tiles,) int32.
    """
    tx0, ty0, w, h = _tile_footprint(splat_data_sorted, cfg)
    n = tx0.shape[0]
    cap = cfg.tiles_per_splat_cap
    num_tiles = cfg.num_tiles

    # enumerate each splat's (up to cap) covered tiles
    c = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 1)
    w_safe = jnp.maximum(w, 1)[:, None]
    dx = c % w_safe
    dy = c // w_safe
    tile = (ty0[:, None] + dy) * cfg.tiles_x + (tx0[:, None] + dx)
    active = c < (w * h)[:, None]
    tile = jnp.where(active, tile, num_tiles)  # sentinel: one-past-last tile

    # pairs are generated in depth-sorted splat order, so a *stable* sort by
    # tile id leaves each tile's run depth-ordered
    splat_idx = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 0)
    pair_tile, pair_splat = jax.lax.sort_key_val(
        tile.reshape(-1), splat_idx.reshape(-1), is_stable=True
    )

    boundaries = jax.lax.broadcasted_iota(jnp.int32, (num_tiles + 1, 1), 0)[:, 0]
    offsets = jnp.searchsorted(pair_tile, boundaries, side="left").astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]
    return {
        "pair_splat": pair_splat,
        "pair_tile": pair_tile,
        "offsets": offsets,
        "counts": counts,
    }
