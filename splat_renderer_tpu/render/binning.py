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
    splat_data: jnp.ndarray,  # (N, 10) packed screen data (see blend.py)
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
    # rows allowed = cap // w_c, via a static select chain: TPU has no vector
    # integer divide (scalar-core fallback, ~8 cyc/elem — CLAUDE.md rule)
    h_allow = jnp.ones_like(w_c)
    for k in range(1, cap + 1):
        h_allow = jnp.where(w_c == k, max(cap // k, 1), h_allow)
    h_c = jnp.minimum(h, h_allow)
    ctx = jnp.clip(jnp.floor(center[:, 0] / ts), 0, cfg.tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(center[:, 1] / ts), 0, cfg.tiles_y - 1).astype(jnp.int32)
    tx0 = jnp.clip(ctx - (w_c - 1) // 2, tx0, tx1 - w_c + 1)
    ty0 = jnp.clip(cty - (h_c - 1) // 2, ty0, ty1 - h_c + 1)

    w_c = jnp.where(alive, w_c, 0)
    h_c = jnp.where(alive, h_c, 0)
    return tx0, ty0, w_c, h_c


def bin_splats(splat_data_sorted: jnp.ndarray, cfg: RenderConfig) -> Binned:
    """Bin depth-sorted splats into per-tile runs.

    `splat_data_sorted` (N, 10) must already be in ascending-depth order (see
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
    wb = w[:, None]
    # dy = c // w, dx = c - dy*w without vector int div (no TPU hardware):
    # count the multiples of w that are <= c
    dy = jnp.zeros_like(c)
    for k in range(1, cap):
        dy = dy + (c >= k * wb).astype(jnp.int32)
    dx = c - dy * wb
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


def canonical_sort_data(splat_data: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Sort (N, 10) records into the pipeline's canonical compositing order:
    ascending (depth_bits, w_pos, w_ro, w_rgb) — depth order with a
    deterministic full-record lexicographic tie-break on the packed words
    (render/packing.py).  Records tied on all four keys are bit-identical, so
    their relative order is unobservable.

    Every compositor (oracle, XLA tiles, Pallas stream) adopts this order:
    bit-equal depths are COMMON on symmetric scenes (circles of points
    equidistant from the camera — measured 58 tie groups, one of 334 records,
    on the demo scene), and an input-order tie-break cannot survive the packed
    pair sort, so the tie-break must be value-determined.  The reference's
    radix sort has the same hazard and leaves tie order to submission order
    (src/RadixSorter.ts:197-264).
    """
    from .packing import depth_bits, pack_records

    dk = depth_bits(splat_data[:, 7])
    w0, w1, w2 = pack_records(splat_data, cfg)
    d = splat_data.shape[1]
    cols = tuple(splat_data[:, k] for k in range(d))
    res = jax.lax.sort((dk, w0, w1, w2) + cols, num_keys=4, is_stable=False)
    return jnp.stack(res[4:], axis=-1)


def depth_sort_data(splat_data: jnp.ndarray) -> jnp.ndarray:
    """Sort the packed (N, 10) records by ascending depth (column 7).

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

    - Pair records carry their splat's 10 floats **through** the variadic tile
      sort (cheap payload columns) instead of being gathered afterwards.
    - Each tile's run is consumed in `block`-row windows whose element starts
      are the run start rounded DOWN to a multiple of 8 (the TPU sublane
      tile): windows overlap run boundaries by up to 7 rows, and the kernel
      masks the leading/trailing rows.  Overlapping reads replace any padding
      re-layout of the stream.

    Returns:
      pair_data (P + block, 10): tile-sorted, depth-ordered-within-tile records
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
    wb = w[:, None]
    dy = jnp.zeros_like(c)  # c // w via compares (no vector int div on TPU)
    for k in range(1, cap):
        dy = dy + (c >= k * wb).astype(jnp.int32)
    tile = (ty0[:, None] + dy) * cfg.tiles_x + (tx0[:, None] + (c - dy * wb))
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
    pair_data = jnp.stack(res[1:], axis=-1)  # (P, 10)
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
    # worst case: every tile's run straddles block boundaries AND has up
    # to 7 lead rows from 8-alignment -> ceil((count+lead)/block) <=
    # count/block + lead/block + 1 per tile; summed: p/block + 2*T + 1
    n_blocks_cap = p // block + 2 * num_tiles + 1

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


def _coverage_counts(
    tx0: jnp.ndarray, ty0: jnp.ndarray, w: jnp.ndarray, h: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Per-tile pair counts via an MXU rectangle-coverage histogram.

    counts[ty, tx] = sum_s 1[tx in [tx0_s, tx0_s + w_s)] * 1[ty in ...] — the
    separable rank-1 structure of rectangular footprints turns the histogram
    into ONE (tiles_y, N) x (N, tiles_x) matmul.  f32 accumulation is exact
    (counts < 2^24).  Replaces jnp.searchsorted over the 4M-pair sorted stream
    (7.3 ms measured on v5e; this is ~0.4 ms): scatter/gather histograms are
    scalar-bound on TPU, but the MXU eats rank-1 sums for free.
    """
    cx = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.tiles_x), 1)
    cy = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.tiles_y), 1)
    tx0c = tx0[:, None]
    ty0c = ty0[:, None]
    x_cov = ((cx >= tx0c) & (cx < tx0c + w[:, None])).astype(jnp.float32)
    y_cov = ((cy >= ty0c) & (cy < ty0c + h[:, None])).astype(jnp.float32)
    counts2d = jnp.einsum(
        "ny,nx->yx", y_cov, x_cov, precision=jax.lax.Precision.HIGHEST
    )
    return counts2d.reshape(-1).astype(jnp.int32)


def bin_splats_packed(
    splat_data_quantized: jnp.ndarray, cfg: RenderConfig, block: int
) -> Binned:
    """Fastest binning path: packed 16-byte records, one fused multi-key sort.

    Takes UNSORTED quantized records (see render/packing.py): the canonical
    compositing order is folded into the pair sort as secondary keys
    (lexicographic (tile, depth_bits, w_pos, w_ro, w_rgb)), so the separate
    global depth sort disappears entirely.  Payload is 3 packed u32 words
    instead of 10 f32 columns — sort cost scales with record bytes.

    Round-2 layout (the round-1 (P, 1) planes cost ~25 ms of pure strided DMA
    in the blend kernel — one useful lane in 128):
      - pair_w0/1/2: (rows, 128) u32 planes — a FREE reshape of the sort
        output; every kernel window is a contiguous full-lane block.
      - per-tile window bases are rounded down to a multiple of `block`, so
        window index maps are plain block indices (no element-granular DMA);
        the kernel masks the lead-in rows.
      - empty tiles get NO windows (round 1 spent ~40% of grid steps on them).
      - offsets/counts come from the MXU coverage histogram (_coverage_counts),
        not a searchsorted over the sorted stream.

    Returns:
      pair_w0/1/2 (rows, 128) u32; offsets (T+1,); counts (T,);
      start_units (T+1,): first window index (in units of `block`) per tile;
      block_off (T+1,): first grid-block per tile; block_tile (n_blocks_cap,):
      owning tile per grid block (T = trash); block_first: 1 at each tile's
      first grid block.
    """
    from .packing import depth_bits, pack_records

    if block % 1024:
        raise ValueError(
            "block must be a multiple of 1024 (the blend kernel's windows are "
            "block/128 x 128 Mosaic blocks; sublane dim must divide by 8)"
        )
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
    w_pos, w_ro, w_rgb = pack_records(splat_data_quantized, cfg)

    def bc(x):
        return jnp.broadcast_to(x[None, :], (cap, n)).reshape(-1)

    # all-columns-as-keys sort: primary tile id, then full-precision depth
    # bits, then the packed payload words as lexicographic tie-breaks — the
    # canonical compositing order (see canonical_sort_data).  Bit-equal
    # depths occur on real scenes (equidistant circles); value-determined
    # ties keep every compositor in exact agreement.  num_keys=5 costs
    # ~+2.7 ms over num_keys=2 at 4M pairs (measured v5e), the cheapest of
    # the deterministic options (vs +3.1 ms for a carried index column).
    res = jax.lax.sort(
        (tile, bc(dkeys), bc(w_pos), bc(w_ro), bc(w_rgb)),
        num_keys=5,
        is_stable=False,
    )
    # pad so the last tile's final window never reads past the end, then
    # reinterpret as (rows, 128) planes — a FREE reshape (same linear order)
    rows = (p + block + 127) // 128
    pad = rows * 128 - p
    zpad = jnp.zeros((pad,), jnp.uint32)
    # one fused (rows, 384) plane: lanes 0-127 = w_pos, 128-255 = w_ro,
    # 256-383 = w_rgb.  A single kernel input halves the Mosaic per-grid-step
    # index_map/DMA-descriptor work vs three planes (the concat is 128-lane-
    # aligned block copies, not an interleave)
    pair_w = jnp.concatenate(
        [jnp.concatenate([col, zpad]).reshape(rows, 128) for col in res[2:]],
        axis=1,
    )

    counts = _coverage_counts(tx0, ty0, w, h, cfg)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )

    start = offsets[:-1] - offsets[:-1] % block  # block-aligned window base
    lead = offsets[:-1] - start
    blocks_per_tile = jnp.where(counts > 0, (counts + lead + block - 1) // block, 0)
    block_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blocks_per_tile, dtype=jnp.int32)]
    )
    # worst case: every nonempty tile adds <= 2 extra windows (lead < block
    # and a straddled boundary)
    n_blocks_cap = p // block + 2 * num_tiles + 1

    markers = (
        jnp.zeros((n_blocks_cap + 1,), jnp.int32).at[block_off].add(1, mode="drop")
    )
    block_ids = jax.lax.broadcasted_iota(jnp.int32, (n_blocks_cap, 1), 0)[:, 0]
    block_tile = jnp.cumsum(markers[:n_blocks_cap], dtype=jnp.int32) - 1
    # empty tiles have zero windows: several block_off entries coincide, the
    # cumsum jumps by >1, and block_tile skips them entirely
    block_first = (
        block_ids == block_off[jnp.minimum(block_tile, num_tiles)]
    ).astype(jnp.int32)
    block_tile = jnp.where(block_tile > num_tiles, num_tiles, block_tile)

    start_units = jnp.concatenate([start // block, jnp.zeros((1,), jnp.int32)])

    # per-block scalar tables: the kernel's index maps and masks become single
    # SMEM loads instead of chained loads + arithmetic (the Mosaic per-grid-
    # step floor is dominated by scalar index_map work; measured 0.45 us/step
    # with computed maps)
    tile_ix = jnp.minimum(block_tile, num_tiles)
    is_real = block_tile < num_tiles
    block_window = jnp.where(
        is_real, start_units[tile_ix] + (block_ids - block_off[tile_ix]), 0
    )
    block_local0 = jnp.where(
        is_real, block_window * block - offsets[tile_ix], 0
    )
    counts_pad = jnp.concatenate([counts, jnp.zeros((1,), counts.dtype)])
    block_count = jnp.where(is_real, counts_pad[tile_ix], 0)
    return {
        "pair_w": pair_w,
        "offsets": offsets,
        "counts": counts,
        "start_units": start_units,
        "block_off": block_off,
        "block_tile": block_tile,
        "block_first": block_first,
        "block_window": block_window,
        "block_local0": block_local0,
        "block_count": block_count,
    }
