"""Sort-based tile binning: depth sort + stable tile-key sort.

Replaces four reference components at once — RadixSorter (+ DepthKeyExtractor
front-end), GPUTileBinner's count/fill atomic passes, PrefixSumScanner, and
PerTileSorter (SURVEY.md section 7 "Design translation"):

- WebGPU: radix-sort splats by depth, atomicAdd-count tile overlaps, readback
  total, prefix-sum offsets, atomicAdd-fill lists (order only approximately
  sorted across workgroups — SURVEY.md section 3.3 footnote).
- TPU (no atomics, static shapes): sort splats by (depth, input index) once —
  each record's sorted row is its canonical *rank* — then expand each splat
  into (tile, splat) pairs with a static per-splat capacity and sort pairs by
  (tile, rank) (fused into one u32 key when the bits fit).  Ranks are unique
  within a tile, so per-tile runs are **exactly** depth-ordered with
  deterministic ties.  Offsets come from an MXU rectangle-coverage histogram
  + cumsum — the reference's scan-size cliff (CPU fallback above 512 tiles,
  src/PrefixSumScanner.ts:80-87) does not exist.

The single GPU->CPU readback the reference kept (sizing the tile-index buffer,
src/GPUTileBinner.ts:244-263) is gone by construction: capacity = N * cap.
"""

from __future__ import annotations

import math
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
    """Clamped tile ranges (tx0, ty0, w, h) per splat — see _footprint_cols."""
    ang = splat_data[:, 8] if cfg.oriented else None
    ratio = splat_data[:, 9] if cfg.oriented else None
    return _footprint_cols(
        splat_data[:, 0],
        splat_data[:, 1],
        splat_data[:, 2],
        jnp.isfinite(splat_data[:, 7]),
        cfg,
        ang=ang,
        ratio=ratio,
    )


def _footprint_cols(
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    radius: jnp.ndarray,
    depth_valid: jnp.ndarray,
    cfg: RenderConfig,
    ang: jnp.ndarray | None = None,
    ratio: jnp.ndarray | None = None,
    cap: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clamped tile ranges (tx0, ty0, w, h) per splat.

    Bounds = center +- bounds_margin * radius (src/SplatProjector.ts:115-121).
    When (ang, ratio) are given (oriented profiles), the pad shrinks to the
    EXACT axis-aligned extents of the rotated support ellipse — semi-axes
    (margin*r*ratio along ang, margin*r across):
        hx = m r sqrt(sin^2 + ratio^2 cos^2),  hy = m r sqrt(cos^2 + ratio^2 sin^2)
    (+1/pos_scale px of slack for trig ulps).  Same trig polynomial as the
    compositors, so the AABB can never under-cover the kernel's cutoff.
    Edge-on splats bin ~1/ratio fewer tiles than the square pad.

    Footprints larger than `cap` tiles (default cfg.tiles_per_splat_cap) are
    shrunk toward the splat's center tile (capacity-bounded expansion; the
    reference merely warns on pathological overlap,
    src/GPUTileBinner.ts:265-281).  Splats below min_screen_radius contribute
    nothing anywhere (src/ComputeShaderRenderer.ts:127-129), so they are
    dropped here.  The class-partitioned expansion (bin_packed_words
    class_caps) passes per-slice slot budgets as `cap`.
    """
    if cap is None:
        cap = cfg.tiles_per_splat_cap
    pad = radius * cfg.bounds_margin
    if ang is not None:
        from .blend import ellipse_cos_sin

        ca, sa = ellipse_cos_sin(ang)
        rr = jnp.clip(ratio, 0.0, 1.0)
        slack = 1.0 / cfg.pos_scale
        if cfg.opaque and cfg.quad:
            # square footprint (cfg.quad): corners at +-r*ratio e_u +- r e_v
            # (minor along the angle direction, like the ellipse) -> AABB
            # extents r*ratio|cos| + r|sin| in x, r*ratio|sin| + r|cos| in y
            aca, asa = jnp.abs(ca), jnp.abs(sa)
            hx = pad * (rr * aca + asa) + slack
            hy = pad * (rr * asa + aca) + slack
        else:
            r2 = rr * rr
            hx = pad * jnp.sqrt(sa * sa + r2 * ca * ca) + slack
            hy = pad * jnp.sqrt(ca * ca + r2 * sa * sa) + slack
    else:
        hx = pad
        hy = pad
    bmin_x, bmax_x = cx - hx, cx + hx
    bmin_y, bmax_y = cy - hy, cy + hy

    tw, th = float(cfg.tile_w), float(cfg.tile_h)
    tx0 = jnp.clip(jnp.floor(bmin_x / tw), 0, cfg.tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(bmin_y / th), 0, cfg.tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(bmax_x / tw), 0, cfg.tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(bmax_y / th), 0, cfg.tiles_y - 1).astype(jnp.int32)

    alive = (
        depth_valid
        & (radius >= cfg.min_screen_radius)
        & (bmax_x >= 0)
        & (bmax_y >= 0)
        & (bmin_x < cfg.width)
        & (bmin_y < cfg.height)
    )

    w = tx1 - tx0 + 1
    h = ty1 - ty0 + 1
    # shrink to <= cap tiles, keeping the window centered on the center tile
    w_c = jnp.minimum(w, cap)
    # rows allowed = cap // w_c, via a static select chain: TPU has no vector
    # integer divide (scalar-core fallback, ~8 cyc/elem — CLAUDE.md rule)
    h_allow = jnp.ones_like(w_c)
    for k in range(1, cap + 1):
        h_allow = jnp.where(w_c == k, max(cap // k, 1), h_allow)
    h_c = jnp.minimum(h, h_allow)
    ctx = jnp.clip(jnp.floor(cx / tw), 0, cfg.tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(cy / th), 0, cfg.tiles_y - 1).astype(jnp.int32)
    tx0 = jnp.clip(ctx - (w_c - 1) // 2, tx0, tx1 - w_c + 1)
    ty0 = jnp.clip(cty - (h_c - 1) // 2, ty0, ty1 - h_c + 1)

    w_c = jnp.where(alive, w_c, 0)
    h_c = jnp.where(alive, h_c, 0)
    return tx0, ty0, w_c, h_c


def _diag_prune(
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    radius: jnp.ndarray,
    tx0: jnp.ndarray,
    ty0: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Diagonal-corner disc prune for 2x2 footprints.

    A splat whose padded bbox spans a 2x2 tile block always covers the two
    edge-adjacent tiles (the disc crosses each boundary line in an interval
    centered on the splat's own row/column), but misses the DIAGONAL tile
    whenever the shared interior corner lies outside the support disc —
    P(miss | 2x2) = 1 - pi/4 ~ 21% for uniform centers, ~17% of all pairs at
    the bench shape.  Dropping those pairs is exact (the nearest point of
    the diagonal tile's rect is the shared corner, so no pixel there can
    have alpha > 0; +1/pos_scale slack absorbs fp ulps).  Applied uniformly
    in every binning path, so run tables stay equal across paths.  For
    oriented profiles the test uses the major-radius disc, which contains
    the support ellipse — still conservative.

    Returns (c_d, miss, dtx, dty): the footprint slot index (row-major
    dy*w+dx) of the diagonal tile, whether to prune it, and the diagonal
    tile's coordinates (used by the count-correction einsum — computed here
    ONCE so the prune and its correction can never drift apart).  Only 2x2
    footprints with the center tile inside the window are candidates
    (larger footprints from high caps are left alone — cap 4, the
    production setting, is always <= 2x2).
    """
    tw, th = float(cfg.tile_w), float(cfg.tile_h)
    ctx = jnp.clip(jnp.floor(cx / tw), 0, cfg.tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(cy / th), 0, cfg.tiles_y - 1).astype(jnp.int32)
    cix = ctx - tx0
    ciy = cty - ty0
    applicable = (
        (w == 2) & (h == 2)
        & (cix >= 0) & (cix <= 1) & (ciy >= 0) & (ciy <= 1)
    )
    corner_x = (tx0 + 1).astype(jnp.float32) * tw
    corner_y = (ty0 + 1).astype(jnp.float32) * th
    dx = cx - corner_x
    dy = cy - corner_y
    pad = radius * cfg.bounds_margin + 1.0 / cfg.pos_scale
    miss = applicable & (dx * dx + dy * dy > pad * pad)
    if cfg.opaque and cfg.quad:
        # square footprints reach the diagonal tile wherever their AABB does
        # — the disc-corner prune does not apply
        miss = jnp.zeros_like(miss)
    c_d = (1 - ciy) * 2 + (1 - cix)
    dtx = tx0 + 1 - cix
    dty = ty0 + 1 - ciy
    return c_d, miss, dtx, dty


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
    c_d, miss, _, _ = _diag_prune(
        splat_data_sorted[:, 0], splat_data_sorted[:, 1],
        splat_data_sorted[:, 2], tx0, ty0, w, h, cfg,
    )

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
    active = (c < (w * h)[:, None]) & ~((c == c_d[:, None]) & miss[:, None])
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
    ascending **(depth_bits, input index)** — depth order with ties at
    bit-equal depth broken by the record's position in the input array.

    Every compositor (oracle, XLA tiles, Pallas stream) adopts this order:
    bit-equal depths are COMMON on symmetric scenes (circles of points
    equidistant from the camera — measured 58 tie groups, one of 334 records,
    on the demo scene), so the tie-break must be part of the pipeline
    semantics.  Input order is exactly the reference's behavior (its radix
    sort is LSD-stable over submission order, src/RadixSorter.ts:197-264 /
    src/shaders/radix-sort.wgsl:205-512), and — the TPU reason — it lets the
    packed pair sort use the record's depth-sorted ROW INDEX as a single
    unique u32 secondary key instead of 3 word-tie-break keys: measured on
    v5e at 4M pairs, (tile, rank) num_keys=2 costs 12.0 ms where the round-2
    word-tie-break 5-key sort cost 22.2 ms (benchmarks/probe_sort_variants.py).

    The sort here is identical to depth_sort_data (stable by depth); the cfg
    arg is kept for API stability.
    """
    del cfg
    return depth_sort_data(splat_data)


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
    c_d, miss, _, _ = _diag_prune(
        splat_data_sorted[:, 0], splat_data_sorted[:, 1],
        splat_data_sorted[:, 2], tx0, ty0, w, h, cfg,
    )

    c = jax.lax.broadcasted_iota(jnp.int32, (n, cap), 1)
    wb = w[:, None]
    dy = jnp.zeros_like(c)  # c // w via compares (no vector int div on TPU)
    for k in range(1, cap):
        dy = dy + (c >= k * wb).astype(jnp.int32)
    tile = (ty0[:, None] + dy) * cfg.tiles_x + (tx0[:, None] + (c - dy * wb))
    active = (c < (w * h)[:, None]) & ~((c == c_d[:, None]) & miss[:, None])
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


def _ceil_log2(x: int) -> int:
    return max(int(x) - 1, 0).bit_length()


def two_word_spec(cfg: RenderConfig):
    """Static constants of the tile-relative 2-word pair payload, or None.

    For isotropic profiles whose projector-capped radii fit the bit budget,
    a pair record packs into ONE u32 `w_a` = cy_rel:11 | cx_rel:11 | r_fx:10
    (positions relative to the owning tile's padded origin, on the cfg
    fixed-point grid) next to the usual w_rgb.  One payload word fewer in the
    pair sort and a third less blend-kernel DMA than the global 3-word
    layout.  Requires radii respecting the projector's tiles_per_splat_cap
    clamp (render/projector.py) — guaranteed in-pipeline; radii beyond the
    r:10 field are clamped defensively.
    """
    if cfg.oriented:
        return None
    ps = cfg.pos_scale
    ts = max(cfg.tile_w, cfg.tile_h)  # per-axis budget: the larger extent
    r_cap_fx = round(cfg.r_cap * ps)
    pad_rel = math.ceil(cfg.bounds_margin * r_cap_fx)
    if r_cap_fx > 1023 or ts * ps + 2 * pad_rel > 2047:
        return None
    return {"pad_rel": int(pad_rel), "r_cap_fx": int(r_cap_fx)}


def bin_splats_packed(
    splat_data_quantized: jnp.ndarray,
    cfg: RenderConfig,
    block: int,
    class_caps: Tuple[int, int] | None = None,
    with_depth: bool = False,
) -> Binned:
    """Fastest binning path: packed records, rank-keyed two-stage sort.

    Takes UNSORTED quantized records (see render/packing.py).  Two sorts:

    1. **Record stage** (N rows): one num_keys=2 sort by (depth_bits, input
       index) — the canonical compositing order (canonical_sort_data) — with
       the three packed words as payload.  Each record's sorted ROW INDEX is
       its unique canonical *rank*.
    2. **Pair stage** (N*cap rows): expand footprint tiles and sort pairs by
       (tile, rank).  Ranks are unique within a tile, so two u32 keys give a
       fully deterministic canonical order; when tile_bits + rank_bits <= 32
       the two keys FUSE into one u32 (tile << shift | rank) and the sort
       runs num_keys=1.  Measured v5e @4M pairs: 9.1 ms fused / 12.0 ms
       num_keys=2, vs 22.2 ms for the round-2 single-stage 5-key word-tie
       sort (benchmarks/probe_sort_variants.py) — XLA variadic sort cost is
       dominated by the number of KEY columns (~3 ms/key) while payload
       columns ride for ~0.5 ms each.

    Payload layout: the 2-word tile-relative form when two_word_spec(cfg)
    allows (isotropic), else the global 3-word (w_pos, w_ro, w_rgb).

    Stream layout (unchanged from round 2): pair_w is one fused (rows,
    128*n_words) u32 plane; per-tile window bases are rounded down to a
    multiple of `block` so every kernel window is a contiguous full-lane
    block; empty tiles get NO windows; offsets/counts come from the MXU
    coverage histogram (_coverage_counts), not a searchsorted.

    Returns:
      pair_w (rows, 128*n_words) u32; offsets (T+1,); counts (T,);
      start_units (T+1,): first window index (in units of `block`) per tile;
      block_off (T+1,): first grid-block per tile; block_tile (n_blocks_cap,):
      owning tile per grid block (T = trash); block_first: 1 at each tile's
      first grid block; block_window/local0/count: per-block scalar tables.
    """
    from .packing import depth_bits, pack_records

    dkeys = depth_bits(splat_data_quantized[:, 7])
    w_pos, w_ro, w_rgb = pack_records(splat_data_quantized, cfg)
    return bin_packed_words(
        dkeys, w_pos, w_ro, w_rgb, cfg, block, class_caps=class_caps,
        with_depth=with_depth,
    )


def bin_packed_words(
    dkeys: jnp.ndarray,  # (N,) u32 depth keys (packing.depth_bits)
    w_pos: jnp.ndarray,  # (N,) u32 cx_fx | cy_fx << 16
    w_ro: jnp.ndarray,  # (N,) u32 r_fx | ang8 << 16 | ratio8 << 24
    w_rgb: jnp.ndarray,  # (N,) u32 r8 | g8 << 8 | b8 << 16 | op8 << 24
    cfg: RenderConfig,
    block: int,
    compact_to: int | None = None,
    class_caps: Tuple[int, int] | None = None,
    with_depth: bool = False,
) -> Binned:
    """Core of bin_splats_packed, taking the packed u32 columns directly —
    the projector's SoA fast path (projector.splat_screen_words) feeds this
    without ever materializing the (N, 10) record array.

    with_depth: carry each record's DEPTH VALUE into the pair stream as one
    extra trailing u32 lane section (the G-buffer path,
    pipeline.render_gbuffer).  No extra plane is needed at the input: the
    depth key already IS the value under the monotonic IEEE-754 flip
    (packing.depth_bits — positive depths map to bits | 0x80000000, so the
    kernel recovers f32 depth as bitcast(key & 0x7FFFFFFF); projection
    culls behind-camera splats to +inf, SplatProjector.ts:77 semantics).
    Costs one payload column in the pair sort (~0.5 ms @4M) and one more
    lane section of blend DMA.

    compact_to: keep only the first `compact_to` rows AFTER the canonical
    record sort (valid records sort before the inf-depth sentinels, so this
    keeps the nearest compact_to records).  The rank-band splat-parallel
    mode (parallel/band.py) uses it to shed its all_to_all sentinel padding
    before the pair-scale work: the pair sort shrinks from N*cap to
    compact_to*cap slots.  Records beyond the capacity are DROPPED (the
    caller checks its valid count and flags overflow).

    class_caps: (C4, C2) static slice capacities for the class-partitioned
    pair expansion.  One extra N-scale fused-key sort orders records by
    footprint class (needs > 2 slots / == 2 / <= 1), and the expansion
    budgets `cap` slots for the first C4 records, 2 for the next C2 and 1
    for the rest — the pair-sort input shrinks from N*cap toward the true
    pair count (the frame's wall is that sort).  Output is identical to
    class_caps=None whenever the census fits (`class_counts` <= caps);
    records spilled past their class's capacity render with a SHRUNK
    footprint (center tiles only, never garbage) and `class_overflow` is
    set so the caller can re-render at safe caps (Engine protocol)."""
    if block % 1024:
        raise ValueError(
            "block must be a multiple of 1024 (the blend kernel's windows are "
            "block/128 x 128 Mosaic blocks; sublane dim must divide by 8)"
        )
    n = dkeys.shape[0]
    cap = cfg.tiles_per_splat_cap
    num_tiles = cfg.num_tiles
    ps = cfg.pos_scale
    po = cfg.pos_offset

    # ---- record stage: canonical rank via one (dkey, iota) sort ----
    # explicit unique iota key instead of is_stable=True: XLA's stable sort
    # costs ~2.5x the iota-keyed one (6.4 vs 2.6 ms @1M, v5e)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    spec = two_word_spec(cfg)
    # turbo depth-key ordering: the whole record stage disappears — the
    # pair key fuses (tile, high depth-key bits) instead of (tile, rank),
    # so no canonical rank is ever needed.  Band compaction and the class
    # partition both consume ranks, so they keep the exact path.
    depth_order = (
        cfg.depth_key_order and compact_to is None and class_caps is None
    )
    ro_in_key = (
        not depth_order and spec is not None and n <= (1 << 21)
    )
    if depth_order:
        # records stay in input order; footprints/payloads are order-
        # agnostic and the pair sort below imposes (tile, depth-high-bits)
        dk_s = dkeys
        r_fx = (w_ro & 0xFFFF).astype(jnp.int32)
        if spec is not None:
            w_ro = None
    elif ro_in_key:
        # isotropic 2-word profile: the only live field of w_ro is the 10-bit
        # radius, so fold it into the LOW bits of the iota tie-break key —
        # (iota << 10) | r sorts identically to iota (iota owns the high
        # bits) and the sort drops a whole payload column (~0.5 ms @1M).
        # n <= 2^21 keeps the packed key within u32.
        r10 = jnp.minimum(w_ro & jnp.uint32(0xFFFF), jnp.uint32(1023))
        iota_r = (iota_n.astype(jnp.uint32) << 10) | r10
        dk_s, iota_r_s, w_pos, w_rgb = jax.lax.sort(
            (dkeys, iota_r, w_pos, w_rgb), num_keys=2, is_stable=False
        )
        r_fx = (iota_r_s & jnp.uint32(0x3FF)).astype(jnp.int32)
        w_ro = None
    else:
        dk_s, _, w_pos, w_ro, w_rgb = jax.lax.sort(
            (dkeys, iota_n, w_pos, w_ro, w_rgb), num_keys=2, is_stable=False
        )
        r_fx = (w_ro & 0xFFFF).astype(jnp.int32)

    # depth-value column for the with_depth stream: dk_s is already aligned
    # with the (record-sorted) payload words in every branch above
    # (depth_order keeps input order, where dkeys == dk_s)
    dk_col = dk_s if with_depth else None

    if compact_to is not None:
        # a capacity above the input size is a no-op (slack * n/sp can
        # exceed n for small meshes)
        n = min(int(compact_to), n)
        dk_s, w_pos, w_rgb, r_fx = (
            dk_s[:n], w_pos[:n], w_rgb[:n], r_fx[:n],
        )
        if w_ro is not None:
            w_ro = w_ro[:n]
        if dk_col is not None:
            dk_col = dk_col[:n]
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    # footprints from the sorted words (unpacked values are grid-exact f32)
    inv_ps = 1.0 / ps

    def _planes(w_pos_x, w_ro_x, r_fx_x):
        """Grid-exact f32 planes from the packed words (order-agnostic)."""
        cx_fx = (w_pos_x & 0xFFFF).astype(jnp.int32)
        cy_fx = (w_pos_x >> 16).astype(jnp.int32)
        if cfg.oriented:
            from .packing import INV_ANGLE_SCALE, INV_RATIO_SCALE

            ang = ((w_ro_x >> 16) & 0xFF).astype(jnp.int32).astype(
                jnp.float32
            ) * INV_ANGLE_SCALE - math.pi
            ratio = (w_ro_x >> 24).astype(jnp.int32).astype(
                jnp.float32
            ) * INV_RATIO_SCALE
        else:
            ang = ratio = None
        cx_f = cx_fx.astype(jnp.float32) * inv_ps - po
        cy_f = cy_fx.astype(jnp.float32) * inv_ps - po
        r_f = r_fx_x.astype(jnp.float32) * inv_ps
        return cx_fx, cy_fx, cx_f, cy_f, r_f, ang, ratio

    cx_fx, cy_fx, cx_f, cy_f, r_f, ang, ratio = _planes(w_pos, w_ro, r_fx)
    tx0, ty0, w, h = _footprint_cols(
        cx_f,
        cy_f,
        r_f,
        dk_s < jnp.uint32(0xFF800000),  # depth finite (< +inf key)
        cfg,
        ang=ang,
        ratio=ratio,
    )

    # footprint-class census (drives the caller's class_caps sizing protocol)
    wh = w * h
    n_hi = jnp.sum((wh > 2).astype(jnp.int32))
    n_mid = jnp.sum((wh >= 2).astype(jnp.int32))

    rank_bits = _ceil_log2(max(n, 2))
    if class_caps is None:
        segs = [(0, n, cap)]
        if depth_order:
            # secondary key = the depth key's top (32 - tile_bits) bits —
            # exactly fills the fused u32 next to the tile field
            rank_col = dkeys >> jnp.uint32(_ceil_log2(num_tiles + 1))
        else:
            rank_col = iota_n.astype(jnp.uint32)
        class_overflow = jnp.bool_(False)
    else:
        # ---- class partition: one N-scale fused-key sort orders records
        # class-major (slots needed: > 2 -> cap, == 2 -> 2, <= 1 -> 1), so
        # the pair expansion can budget slots per class slice.  P shrinks
        # from N*cap toward the real pair count (~2.1N vs 4N at the 1M
        # bench shape) and the PAIR sort — the frame's wall — shrinks with
        # it.  Ranks ride in the key's low bits, so canonical compositing
        # order is untouched.  Slice capacities are static (jit): the
        # caller sizes them from the class census with headroom and
        # re-renders on class_overflow (pipeline.Engine growth protocol,
        # same as the blend window classes).
        c4, c2 = int(class_caps[0]), int(class_caps[1])
        if c4 < 0 or c2 < 0 or c4 + c2 > n:
            raise ValueError(
                "class_caps must satisfy C4 >= 0, C2 >= 0, C4 + C2 <= n"
            )
        code = jnp.where(
            wh > 2, 0, jnp.where(wh == 2, 1, jnp.where(wh == 1, 2, 3))
        ).astype(jnp.uint32)
        class_overflow = (n_hi > c4) | (n_mid > c4 + c2)
        rank_u = iota_n.astype(jnp.uint32)
        fold_r = w_ro is None and rank_bits + 12 <= 32
        # the depth column (with_depth) rides every class sort as one extra
        # trailing payload column
        dk_pay = () if dk_col is None else (dk_col,)
        if fold_r:
            # isotropic 2-word profile: key = code:2 | rank | r:10 — the
            # radius rides in the key (same trick as ro_in_key above) and
            # the sort carries only 2 payload columns
            ckey = (
                (code << (rank_bits + 10))
                | (rank_u << 10)
                | jnp.minimum(r_fx, 1023).astype(jnp.uint32)
            )
            res_c = jax.lax.sort(
                (ckey, w_pos, w_rgb) + dk_pay, num_keys=1, is_stable=False
            )
            ckey_s, w_pos, w_rgb = res_c[:3]
            if dk_col is not None:
                dk_col = res_c[3]
            r_fx = (ckey_s & jnp.uint32(0x3FF)).astype(jnp.int32)
            rank_col = (ckey_s >> 10) & jnp.uint32((1 << rank_bits) - 1)
            code_shift = rank_bits + 10
        elif w_ro is None:
            ckey = (code << rank_bits) | rank_u
            res_c = jax.lax.sort(
                (ckey, w_pos, w_rgb, r_fx.astype(jnp.uint32)) + dk_pay,
                num_keys=1,
                is_stable=False,
            )
            ckey_s, w_pos, w_rgb, r_u = res_c[:4]
            if dk_col is not None:
                dk_col = res_c[4]
            r_fx = r_u.astype(jnp.int32)
            rank_col = ckey_s & jnp.uint32((1 << rank_bits) - 1)
            code_shift = rank_bits
        else:
            ckey = (code << rank_bits) | rank_u
            res_c = jax.lax.sort(
                (ckey, w_pos, w_ro, w_rgb) + dk_pay, num_keys=1,
                is_stable=False,
            )
            ckey_s, w_pos, w_ro, w_rgb = res_c[:4]
            if dk_col is not None:
                dk_col = res_c[4]
            r_fx = (w_ro & 0xFFFF).astype(jnp.int32)
            rank_col = ckey_s & jnp.uint32((1 << rank_bits) - 1)
            code_shift = rank_bits
        cx_fx, cy_fx, cx_f, cy_f, r_f, ang, ratio = _planes(w_pos, w_ro, r_fx)
        alive_c = (ckey_s >> code_shift) < 3
        segs = [
            s
            for s in ((0, c4, cap), (c4, c4 + c2, 2), (c4 + c2, n, 1))
            if s[1] > s[0]
        ]
        # effective per-slice footprints: counts and the expansion must agree
        # EXACTLY even under class overflow (spilled records degrade to their
        # slice's slot budget around the center tile — fewer tiles, never
        # garbage).  Recomputed elementwise from the reordered words; for
        # records whose class fits the slice budget this reproduces the
        # full-cap footprint bit-identically.
        parts = [
            _footprint_cols(
                cx_f[lo:hi],
                cy_f[lo:hi],
                r_f[lo:hi],
                alive_c[lo:hi],
                cfg,
                ang=None if ang is None else ang[lo:hi],
                ratio=None if ratio is None else ratio[lo:hi],
                cap=budget,
            )
            for lo, hi, budget in segs
        ]
        tx0, ty0, w, h = (
            jnp.concatenate([pt[i] for pt in parts]) if len(parts) > 1
            else parts[0][i]
            for i in range(4)
        )

    c_d, miss, dtx_d, dty_d = _diag_prune(cx_f, cy_f, r_f, tx0, ty0, w, h, cfg)

    # ---- pair stage: slot-major (budget, m) expansion per class slice
    # (broadcasts become contiguous tiled copies, ~3x faster than (n, cap)
    # element-repeats); the single-slice [(0, n, cap)] case is the classic
    # full-cap expansion ----
    tile_parts, rank_parts, pay_parts = [], [], []
    for lo, hi, budget in segs:
        m = hi - lo
        c = jax.lax.broadcasted_iota(jnp.int32, (budget, m), 0)
        wb = w[None, lo:hi]
        # dy = c // w without integer division (TPU has no vector int
        # divide): count the multiples of w that are <= c
        dy = jnp.zeros_like(c)
        for k in range(1, budget):
            dy = dy + (c >= k * wb).astype(jnp.int32)
        dx = c - dy * wb
        tile_x = tx0[None, lo:hi] + dx
        tile_y = ty0[None, lo:hi] + dy
        tile = tile_y * cfg.tiles_x + tile_x
        active = (c < (w * h)[None, lo:hi]) & ~(
            (c == c_d[None, lo:hi]) & miss[None, lo:hi]
        )
        tile = jnp.where(active, tile, num_tiles)
        tile_parts.append(tile.reshape(-1))
        rank_parts.append(
            jnp.broadcast_to(rank_col[None, lo:hi], (budget, m)).reshape(-1)
        )

        def bc(x, budget=budget, m=m, lo=lo, hi=hi):
            return jnp.broadcast_to(x[None, lo:hi], (budget, m)).reshape(-1)

        if spec is not None:
            # tile-relative packing: cx_rel = cx_fx - ((tx*tw + po)*ps -
            # pad_rel); each axis uses ITS tile extent
            pad_rel = spec["pad_rel"]
            twps, thps = cfg.tile_w * ps, cfg.tile_h * ps
            r_cl = jnp.minimum(r_fx[lo:hi], 1023)  # contract: r <= r_cap_fx
            cx_rel = (
                cx_fx[None, lo:hi] - tile_x * int(twps) + int(pad_rel - po * ps)
            )
            cy_rel = (
                cy_fx[None, lo:hi] - tile_y * int(thps) + int(pad_rel - po * ps)
            )
            w_a = (
                (cy_rel.astype(jnp.uint32) << 21)
                | (cx_rel.astype(jnp.uint32) << 10)
                | r_cl.astype(jnp.uint32)[None, :]
            )
            w_a = jnp.where(active, w_a, 0).reshape(-1)
            cols = (w_a, bc(w_rgb))
            pay_parts.append(cols if dk_col is None else cols + (bc(dk_col),))
        else:
            cols = (bc(w_pos), bc(w_ro), bc(w_rgb))
            pay_parts.append(cols if dk_col is None else cols + (bc(dk_col),))

    def cat(parts):
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    tile_flat = cat(tile_parts)
    rank_flat = cat(rank_parts)
    payload = tuple(cat(list(cols)) for cols in zip(*pay_parts))
    p = tile_flat.shape[0]  # = sum(budget * slice) <= n * cap

    tile_bits = _ceil_log2(num_tiles + 1)
    coarse = tile_bits + rank_bits - 32
    if depth_order:
        # rank_col already holds the depth key's top (32 - tile_bits) bits:
        # one fused u32 key, always num_keys=1, no record sort anywhere
        shift = 32 - tile_bits
        fused = (tile_flat.astype(jnp.uint32) << shift) | rank_flat
        res = jax.lax.sort((fused,) + payload, num_keys=1, is_stable=False)
        sorted_payload = res[1:]
    elif coarse <= 0 or (cfg.fast_math and coarse <= 4):
        # single fused u32 key: (tile << shift) | rank — ranks unique per
        # tile, so num_keys=1 is fully deterministic (no tie groups at all).
        # Fast profile: when the bits don't fit, coarsen the rank by the
        # deficit (<= 4 bits) — records within the same 2^coarse-row band of
        # the depth sort may composite in arbitrary order inside one tile
        # (a sub-quantization-step deviation; measured v5e: nk1 9.1 ms vs
        # nk2 12.0 ms @4M).
        shift = 32 - tile_bits
        rank = rank_flat
        if coarse > 0:
            rank = rank >> coarse
        fused = (tile_flat.astype(jnp.uint32) << shift) | rank
        res = jax.lax.sort((fused,) + payload, num_keys=1, is_stable=False)
        sorted_payload = res[1:]
    else:
        res = jax.lax.sort(
            (tile_flat, rank_flat.astype(jnp.int32)) + payload,
            num_keys=2,
            is_stable=False,
        )
        sorted_payload = res[2:]

    # pad so the last tile's final window never reads past the end, then
    # reinterpret as (rows, 128) planes — a FREE reshape (same linear order).
    # One fused (rows, 128*n_words) plane: a single kernel input halves the
    # Mosaic per-grid-step index_map/DMA work vs separate planes (the concat
    # is 128-lane-aligned block copies, not an interleave)
    rows = (p + block + 127) // 128
    pad = rows * 128 - p
    zpad = jnp.zeros((pad,), jnp.uint32)
    pair_w = jnp.concatenate(
        [jnp.concatenate([col, zpad]).reshape(rows, 128) for col in sorted_payload],
        axis=1,
    )

    counts = _pair_counts(tx0, ty0, w, h, dtx_d, dty_d, miss, cfg)
    out = stream_tables(counts, p, block, cfg)
    out["pair_w"] = pair_w
    out["class_counts"] = jnp.stack([n_hi, n_mid])
    out["class_overflow"] = class_overflow
    return out


# stream lane-section order of the differentiable f32 pair stream;
# oriented profiles append the ellipse fields.  depth is ALWAYS the last
# section: the kernel pair accumulates alpha-weighted expected depth as a
# 4th color channel (render_diff_gbuffer's Pallas path), and keeping it
# last preserves the oriented ang/ratio indices (7, 8) the kernels slice.
DIFF_FIELDS = ("cx", "cy", "radius", "opacity", "r", "g", "b")
DIFF_FIELDS_ORIENTED = DIFF_FIELDS + ("angle", "ratio")


def diff_fields(cfg: RenderConfig) -> Tuple[str, ...]:
    base = DIFF_FIELDS_ORIENTED if cfg.oriented else DIFF_FIELDS
    return base + ("depth",)


def bin_planes_diff(
    planes: Dict[str, jnp.ndarray],  # continuous (N,) fields (shade_planes)
    cfg: RenderConfig,
    block: int,
) -> Binned:
    """Binning for the DIFFERENTIABLE Pallas blend (ops/tile_blend_diff):
    tile-sorted pair stream of CONTINUOUS f32 record planes plus the same
    window tables as bin_packed_words — and the two permutation columns the
    custom-VJP backward needs to route per-pair gradients back to input
    order (`rank_sorted` pair->rank, `src` rank->input index).

    No quantization anywhere — the values blend exactly as shade_planes
    produced them, matching render_diff's scan path semantics.  Oriented
    profiles carry two extra plane sections (angle, ratio) and use the exact
    rotated-ellipse AABB for tile coverage, like the exact pipeline.  All
    integer structure (footprints, tiles, tables) is derived from forward
    VALUES and treated as constant by the gradient (stop-gradient structure,
    standard differentiable rasterization — see render/diff.py)."""
    if block % 1024:
        raise ValueError("block must be a multiple of 1024")
    cx, cy, radius = planes["cx"], planes["cy"], planes["radius"]
    depth = planes["depth"]
    n = cx.shape[0]
    cap = cfg.tiles_per_splat_cap
    num_tiles = cfg.num_tiles

    # ---- record stage: canonical (depth, input index) sort; the sorted
    # iota column is src (rank -> input index) ----
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    fields = diff_fields(cfg)
    field_cols = tuple(
        jnp.clip(planes[k], 0.0, 1.0) if k in ("opacity", "r", "g", "b")
        else planes[k]
        for k in fields
        if k != "depth"  # depth is the sort KEY; re-appended below
    )
    res = jax.lax.sort((depth, iota_n) + field_cols, num_keys=2)
    depth_s, src = res[0], res[1]
    # canonical-order field planes; depth rides last (diff_fields order).
    # Culled records carry inf depth (sort sentinel) — zero it in the
    # STREAM copy: their blend weight is exactly 0, but 0 * inf = NaN would
    # contaminate the kernel's MXU contraction.
    cols_s = res[2:] + (jnp.where(jnp.isfinite(depth_s), depth_s, 0.0),)

    tx0, ty0, w, h = _footprint_cols(
        cols_s[0], cols_s[1], cols_s[2], jnp.isfinite(depth_s), cfg,
        ang=cols_s[7] if cfg.oriented else None,
        ratio=cols_s[8] if cfg.oriented else None,
    )
    c_d, miss, dtx_d, dty_d = _diag_prune(
        cols_s[0], cols_s[1], cols_s[2], tx0, ty0, w, h, cfg
    )

    # ---- pair stage: slot-major (cap, n) expansion, (tile, rank) sort ----
    c = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
    wb = w[None, :]
    dy = jnp.zeros_like(c)  # c // w via compares (no vector int div on TPU)
    for k in range(1, cap):
        dy = dy + (c >= k * wb).astype(jnp.int32)
    tile = (ty0[None, :] + dy) * cfg.tiles_x + (tx0[None, :] + (c - dy * wb))
    active = (c < (w * h)[None, :]) & ~((c == c_d[None, :]) & miss[None, :])
    tile_flat = jnp.where(active, tile, num_tiles).reshape(-1)
    rank_col = iota_n.astype(jnp.uint32)
    rank_flat = jnp.broadcast_to(rank_col[None, :], (cap, n)).reshape(-1)
    payload = tuple(
        jnp.broadcast_to(col[None, :], (cap, n)).reshape(-1) for col in cols_s
    )
    p = n * cap

    rank_bits = _ceil_log2(max(n, 2))
    tile_bits = _ceil_log2(num_tiles + 1)
    if tile_bits + rank_bits <= 32:
        shift = 32 - tile_bits
        fused = (tile_flat.astype(jnp.uint32) << shift) | rank_flat
        res = jax.lax.sort((fused,) + payload, num_keys=1, is_stable=False)
        rank_sorted = res[0] & jnp.uint32((1 << shift) - 1)
        sorted_payload = res[1:]
    else:
        res = jax.lax.sort(
            (tile_flat, rank_flat.astype(jnp.int32)) + payload,
            num_keys=2,
            is_stable=False,
        )
        rank_sorted = res[1].astype(jnp.uint32)
        sorted_payload = res[2:]

    rows = (p + block + 127) // 128
    pad = rows * 128 - p
    zpad = jnp.zeros((pad,), jnp.float32)
    pair_f = jnp.concatenate(
        [jnp.concatenate([col, zpad]).reshape(rows, 128) for col in sorted_payload],
        axis=1,
    )  # (rows, 128 * 7) f32

    counts = _pair_counts(tx0, ty0, w, h, dtx_d, dty_d, miss, cfg)
    out = stream_tables(counts, p, block, cfg)
    out["pair_f"] = pair_f
    out["rank_sorted"] = rank_sorted
    out["src"] = src
    return out


def _pair_counts(
    tx0: jnp.ndarray, ty0: jnp.ndarray, w: jnp.ndarray, h: jnp.ndarray,
    dtx_d: jnp.ndarray, dty_d: jnp.ndarray, miss: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Exact per-tile pair counts: MXU coverage histogram minus the
    diagonal-prune corrections.  The pruned (splat, tile) set is rank-1
    separable per splat ([tx == dtx][ty == dty] * miss), so the correction is
    one more MXU matmul — the histogram stays scatter-free."""
    counts = _coverage_counts(tx0, ty0, w, h, cfg)
    iota_tx = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.tiles_x), 1)
    iota_ty = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.tiles_y), 1)
    ex = (iota_tx == dtx_d[:, None]).astype(jnp.float32)
    ey = ((iota_ty == dty_d[:, None]) & miss[:, None]).astype(jnp.float32)
    corr = jnp.einsum(
        "ny,nx->yx", ey, ex, precision=jax.lax.Precision.HIGHEST
    ).reshape(-1).astype(jnp.int32)
    return counts - corr


def stream_tables(
    counts: jnp.ndarray,  # (T,) exact per-tile pair counts
    p: int,  # total pair slots in the sorted stream
    block: int,
    cfg: RenderConfig,
) -> Binned:
    """Per-block/per-tile scalar tables for the streaming blend kernels,
    derived from the per-tile counts alone (shared by the packed-words path
    and the differentiable f32-planes path — bin_planes_diff).

    Window bases are per-tile run starts rounded DOWN to a multiple of
    `block`, so every kernel window is a contiguous full-lane block; empty
    tiles get NO windows.  The per-block tables turn the kernel's index maps
    and masks into single SMEM loads (the Mosaic per-grid-step floor is
    dominated by scalar index_map work; measured 0.45 us/step with computed
    maps)."""
    num_tiles = cfg.num_tiles
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

    # tile-major kernel tables (ops.tile_blend.pallas_blend_tiles_tm):
    # nonempty tiles compacted in tile order — one grid step per tile, the
    # kernel streams its consecutive windows itself.  T-scale gathers (~8k)
    # are fine; it is PAIR-scale gathers that are forbidden.
    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0)[:, 0]
    nz = counts > 0
    tile_list = jax.lax.sort(jnp.where(nz, tile_ids, num_tiles))
    safe = jnp.minimum(tile_list, num_tiles - 1)
    real = tile_list < num_tiles
    t_win0 = jnp.where(real, start_units[safe], 0)
    return {
        "offsets": offsets,
        "counts": counts,
        "start_units": start_units,
        "block_off": block_off,
        "block_tile": block_tile,
        "block_first": block_first,
        "block_window": block_window,
        "block_local0": block_local0,
        "block_count": block_count,
        "tile_list": tile_list,
        "tile_win0": t_win0,
        "tile_nwin": jnp.where(real, blocks_per_tile[safe], 0),
        "tile_local0": jnp.where(real, t_win0 * block - offsets[safe], 0),
        "tile_count": jnp.where(real, counts[safe], 0),
        "tiles_used": jnp.sum(nz.astype(jnp.int32)),
    }
