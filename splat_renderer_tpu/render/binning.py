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


def depth_sort_data(splat_data: jnp.ndarray) -> jnp.ndarray:
    """Sort the packed (N, 8) records by ascending depth (column 7).

    Uses one variadic sort that carries all columns through the sort network —
    on TPU this is ~5x faster than sort_key_val + a row gather (XLA TPU
    gathers cost ~8 cycles/element on the scalar core).
    """
    d = splat_data.shape[1]
    cols = tuple(splat_data[:, k] for k in range(d))
    others = tuple(k for k in range(d) if k != 7)
    res = jax.lax.sort(
        (cols[7],) + tuple(cols[k] for k in others), num_keys=1, is_stable=True
    )
    out = [None] * d
    out[7] = res[0]
    for i, k in enumerate(others):
        out[k] = res[1 + i]
    return jnp.stack(out, axis=-1)


def bin_splats_stream(
    splat_data_sorted: jnp.ndarray, cfg: RenderConfig, block: int
) -> Binned:
    """Binning for the streaming Pallas blend kernel: tile-sorted pair *data*
    plus per-block window metadata — zero large gathers, zero re-layout.

    - Pair records carry their splat's 8 floats **through** the variadic tile
      sort (cheap payload columns) instead of being gathered afterwards.
    - Each tile's run is consumed in `block`-row windows whose element starts
      are the run start rounded DOWN to a multiple of 8 (the TPU sublane
      tile): windows overlap run boundaries by up to 7 rows, and the kernel
      masks the leading/trailing rows.  Overlapping reads replace any padding
      re-layout of the stream.

    Returns:
      pair_data (P + block, 8): tile-sorted, depth-ordered-within-tile records
          (tail-padded for window overrun)
      offsets (T+1,), counts (T,): per-tile runs in the pair stream
      start8 (T+1,): 8-aligned window base per tile
      block_off (T+1,): first block index per tile
      block_tile (n_blocks_cap,): owning tile per block (T = trash)
      block_first (n_blocks_cap,): 1 where a block is its tile's first
    """
    if block % 8:
        raise ValueError("block must be a multiple of 8")
    tx0, ty0, w, h = _tile_footprint(splat_data_sorted, cfg)
    n = tx0.shape[0]
    cap = cfg.tiles_per_splat_cap
    num_tiles = cfg.num_tiles
    p = n * cap

    c = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 1)
    w_safe = jnp.maximum(w, 1)[:, None]
    tile = (ty0[:, None] + c // w_safe) * cfg.tiles_x + (tx0[:, None] + c % w_safe)
    active = c < (w * h)[:, None]
    tile = jnp.where(active, tile, num_tiles).reshape(-1)

    # carry the data columns through one stable variadic sort by tile id
    ncols = splat_data_sorted.shape[1]
    data_cols = tuple(
        jnp.broadcast_to(splat_data_sorted[:, k : k + 1], (n, cap)).reshape(-1)
        for k in range(ncols)
    )
    res = jax.lax.sort((tile,) + data_cols, num_keys=1, is_stable=True)
    pair_tile = res[0]
    pair_data = jnp.stack(res[1:], axis=-1)  # (P, 8)
    pair_data = jnp.concatenate(
        [pair_data, jnp.zeros((block, ncols), pair_data.dtype)]
    )

    boundaries = jax.lax.broadcasted_iota(jnp.int32, (num_tiles + 1, 1), 0)[:, 0]
    offsets = jnp.searchsorted(pair_tile, boundaries, side="left").astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]

    start8 = (offsets[:-1] // 8) * 8  # (T,)
    lead = offsets[:-1] - start8
    blocks_per_tile = (counts + lead + block - 1) // block
    block_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blocks_per_tile, dtype=jnp.int32)]
    )
    n_blocks_cap = p // block + num_tiles + 1  # static upper bound

    markers = (
        jnp.zeros((n_blocks_cap + 1,), jnp.int32)
        .at[block_off]
        .add(1, mode="drop")
    )
    block_ids = jax.lax.broadcasted_iota(jnp.int32, (n_blocks_cap, 1), 0)[:, 0]
    block_tile = jnp.cumsum(markers[:n_blocks_cap], dtype=jnp.int32) - 1
    block_first = (
        block_ids == block_off[jnp.minimum(block_tile, num_tiles)]
    ).astype(jnp.int32)

    start8 = jnp.concatenate([start8, jnp.zeros((1,), jnp.int32)])  # (T+1,)
    return {
        "pair_data": pair_data,
        "offsets": offsets,
        "counts": counts,
        "start8": start8,
        "block_off": block_off,
        "block_tile": block_tile,
        "block_first": block_first,
    }


def bin_splats_packed(
    splat_data_quantized: jnp.ndarray, cfg: RenderConfig, block: int
) -> Binned:
    """Fastest binning path: packed 16-byte records, one fused two-key sort.

    Takes UNSORTED quantized records (see render/packing.py): the depth order
    is folded into the pair sort as a secondary key (lexicographic
    (tile, depth_bits) sort), so the separate global depth sort disappears
    entirely.  Payload is 3 packed u32 words instead of 8 f32 columns —
    sort cost scales with record bytes (~5 ms per 4M-element column on v5e).

    Returns the same stream/block metadata as bin_splats_stream, with
    pair_words (P + block, 3) uint32 in place of pair_data.
    """
    from .packing import depth_bits, pack_records

    if block % 8:
        raise ValueError("block must be a multiple of 8")
    tx0, ty0, w, h = _tile_footprint(splat_data_quantized, cfg)
    n = tx0.shape[0]
    cap = cfg.tiles_per_splat_cap
    num_tiles = cfg.num_tiles
    p = n * cap

    # slot-major (cap, n) expansion: broadcasts become contiguous tiled
    # copies (~3x faster on TPU than the element-repeat of (n, cap) layout)
    c = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
    wb = w[None, :]
    # dy = c // w without integer division (TPU has no vector int divide):
    # count the multiples of w that are <= c
    dy = jnp.zeros_like(c)
    for k in range(1, cap):
        dy = dy + (c >= k * wb).astype(jnp.int32)
    dx = c - dy * wb
    tile = (ty0[None, :] + dy) * cfg.tiles_x + (tx0[None, :] + dx)
    active = c < (w * h)[None, :]
    tile = jnp.where(active, tile, num_tiles).reshape(-1)

    dkeys = depth_bits(splat_data_quantized[:, 7])
    w_pos, w_ro, w_rgb = pack_records(splat_data_quantized)

    def bc(x):
        return jnp.broadcast_to(x[None, :], (cap, n)).reshape(-1)

    # two-key sort: primary tile id, secondary full-precision depth bits;
    # non-stable is fine (remaining ties are distinct splats at bit-equal
    # depth — compositing order between them is unobservable up to fp
    # reassociation)
    res = jax.lax.sort(
        (tile, bc(dkeys), bc(w_pos), bc(w_ro), bc(w_rgb)),
        num_keys=2,
        is_stable=False,
    )
    pair_tile = res[0]
    zpad = jnp.zeros((block,), jnp.uint32)
    pair_w = tuple(
        jnp.concatenate([col, zpad])[:, None] for col in res[2:]
    )  # 3 x (P + block, 1) — separate planes: interleaving into (P, 3) is a
    # strided relayout XLA does ~10x slower than these copies

    boundaries = jax.lax.broadcasted_iota(jnp.int32, (num_tiles + 1, 1), 0)[:, 0]
    offsets = jnp.searchsorted(pair_tile, boundaries, side="left").astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]

    start8 = (offsets[:-1] // 8) * 8
    lead = offsets[:-1] - start8
    blocks_per_tile = (counts + lead + block - 1) // block
    block_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blocks_per_tile, dtype=jnp.int32)]
    )
    n_blocks_cap = p // block + num_tiles + 1

    markers = (
        jnp.zeros((n_blocks_cap + 1,), jnp.int32).at[block_off].add(1, mode="drop")
    )
    block_ids = jax.lax.broadcasted_iota(jnp.int32, (n_blocks_cap, 1), 0)[:, 0]
    block_tile = jnp.cumsum(markers[:n_blocks_cap], dtype=jnp.int32) - 1
    block_first = (
        block_ids == block_off[jnp.minimum(block_tile, num_tiles)]
    ).astype(jnp.int32)

    start8 = jnp.concatenate([start8, jnp.zeros((1,), jnp.int32)])
    return {
        "pair_w0": pair_w[0],
        "pair_w1": pair_w[1],
        "pair_w2": pair_w[2],
        "offsets": offsets,
        "counts": counts,
        "start8": start8,
        "block_off": block_off,
        "block_tile": block_tile,
        "block_first": block_first,
    }
