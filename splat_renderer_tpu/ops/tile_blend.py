"""Pallas TPU kernel: per-tile front-to-back splat compositing.

The hot loop of the whole engine — counterpart of the reference's per-pixel
compute compositor (src/ComputeShaderRenderer.ts:150-198, 8x8-thread
workgroups walking a tile's splat list with an `alpha >= 0.99` break).

TPU shape of the same computation — a *streaming* kernel over the tile-sorted
packed pair stream produced by render/binning.bin_splats_packed:

  The grid walks fixed-size windows of the stream.  Window element offsets
  come from a scalar-prefetched block->tile map: each tile's run is read in
  `block`-row windows based at the run start rounded down to the 8-row
  sublane tile (windows overlap run boundaries; leading/trailing rows are
  masked).  Mosaic pipelines the window DMAs double-buffered; there is no
  gather, no scatter, and no re-layout of the stream anywhere.

  Records arrive packed (3 x u32, render/packing.py) and are unpacked with
  shifts on the VPU — 16 bytes of DMA per record instead of 36.

  The (8, tile_pixels) accumulator block stays resident in VMEM while
  consecutive grid steps hit the same tile (the stream is tile-monotonic) and
  is flushed to HBM exactly once per tile.

  Per window: an (block, tile_pixels) alpha matrix on the VPU, an exclusive
  transmittance prefix by log-depth doubling (shifted multiplies instead of a
  serial loop), and the premultiplied color fold as one (3, block) x (block,
  tile_pixels) f32 matmul.

  Early termination: the reference's per-pixel `break` becomes a per-tile
  window-granular predicate — compute is skipped once every pixel's
  transmittance is below cfg.transmittance_eps (SURVEY.md section 7 "Early
  termination in a SIMD world"); the stream keeps flowing, so no dynamic
  control flow reaches the pipeline.

Order-correctness was bought entirely by the binner's (tile, depth) two-key
sort: runs are exactly depth-ordered, so the kernel needs no sorting and no
atomics.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..render.binning import Binned, bin_splats_packed
from ..render.compositor import tiles_to_image
from ..render.packing import ANGLE_SCALE, COLOR_SCALE, POS_OFFSET, POS_SCALE, RATIO_SCALE


def _row_shift_down(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift rows down by k (row i <- row i-k), filling the top k rows with 1."""
    rolled = pltpu.roll(x, shift=k, axis=0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row_ids >= k, rolled, 1.0)


def _exclusive_cumprod_rows(q: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along axis 0 (rows) via Hillis-Steele
    doubling: out[i] = prod_{j<i} q[j].  Rows must be a power of two.

    (A two-level grouped variant is ~1.8x faster in isolation but shows no
    end-to-end gain — the kernel is bound by per-grid-step overheads, not
    VPU ops; keeping the simple form.  See NOTES.md perf levers.)
    """
    c = q.shape[0]
    assert (c & (c - 1)) == 0, "block size must be a power of two"
    x = _row_shift_down(q, 1)
    k = 1
    while k < c:
        x = x * _row_shift_down(x, k)
        k *= 2
    return x


PI = math.pi


def _make_kernel(cfg: RenderConfig, block: int, eps: float):
    tp = cfg.tile_pixels
    ts = cfg.tile_size
    inv_2sigma2 = 0.5 / (cfg.sigma * cfg.sigma)
    margin2 = cfg.bounds_margin * cfg.bounds_margin
    num_tiles = cfg.num_tiles

    def kernel(
        block_tile_ref,  # (n_blocks_cap,) owning tile per block
        block_first_ref,  # (n_blocks_cap,) 1 at each tile's first block
        start8_ref,  # (T+1,) 8-aligned window base per tile
        block_off_ref,  # (T+1,) first block index per tile
        offsets_ref,  # (T+1,) run starts in the pair stream
        counts_ref,  # (T+1,) run lengths (last entry 0)
        w_pos_ref,  # (block, 1) u32 packed position window, auto-pipelined
        w_ro_ref,  # (block, 1) u32 radius|opacity window
        w_rgb_ref,  # (block, 1) u32 color window
        out_ref,  # (1, 8, tp): rows 0-2 color, 3 transmittance
        trans_ref,  # VMEM scratch (1, tp)
    ):
        b = pl.program_id(0)
        t = block_tile_ref[b]
        is_trash = t >= num_tiles

        @pl.when(jnp.logical_and(block_first_ref[b] == 1, jnp.logical_not(is_trash)))
        def _():
            trans_ref[...] = jnp.ones((1, tp), jnp.float32)
            out_ref[0, 0:4, :] = jnp.zeros((4, tp), jnp.float32)
            out_ref[0, 4:8, :] = jnp.zeros((4, tp), jnp.float32)

        trans = trans_ref[...]
        live = jnp.logical_and(jnp.logical_not(is_trash), jnp.max(trans) > eps)

        @pl.when(live)
        def _():
            # tile-constant pixel coordinates
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
            origin_x = ((t % cfg.tiles_x) * ts).astype(jnp.float32)
            origin_y = ((t // cfg.tiles_x) * ts).astype(jnp.float32)
            px = origin_x + (lane % ts).astype(jnp.float32) + 0.5
            py = origin_y + (lane // ts).astype(jnp.float32) + 0.5

            # unpack records (render/packing.py layout)
            w_pos = w_pos_ref[:]  # (block, 1) u32
            w_ro = w_ro_ref[:]
            w_rgb = w_rgb_ref[:]

            def u2f(x):
                # Mosaic lacks a direct u32->f32 cast; all unpacked fields
                # fit in 16 bits, so hop through int32
                return x.astype(jnp.int32).astype(jnp.float32)

            cx = u2f(w_pos & 0xFFFF) / POS_SCALE - POS_OFFSET
            cy = u2f(w_pos >> 16) / POS_SCALE - POS_OFFSET
            r = u2f(w_ro & 0xFFFF) / POS_SCALE
            op = u2f(w_rgb >> 24) / COLOR_SCALE

            dx = px - cx  # (block, tp)
            dy = py - cy
            ok = r >= cfg.min_screen_radius  # (block, 1), broadcasts
            if cfg.oriented:
                # distance in the splat's screen-ellipse frame
                ang = u2f((w_ro >> 16) & 0xFF) / ANGLE_SCALE - PI
                ratio = jnp.maximum(u2f(w_ro >> 24) / RATIO_SCALE, 1e-3)
                ca = jnp.cos(ang)
                sa = jnp.sin(ang)
                # minor axis lies along the angle direction (see blend.py)
                du = (ca * dx + sa * dy) / ratio
                dv = -sa * dx + ca * dy
                d2 = du * du + dv * dv
            else:
                d2 = dx * dx + dy * dy
            inv_r2 = 1.0 / jnp.maximum(r * r, 1e-12)
            nd2 = d2 * inv_r2
            if cfg.opaque:
                # z-buffer semantics: nearest covering splat wins exactly
                # (front-to-back + alpha 1), src/Renderer.ts:189-201
                shape = jnp.where(nd2 <= 1.0, 1.0, 0.0)
            else:
                # disc support cutoff at bounds_margin * r (see blend.py)
                shape = jnp.where(
                    nd2 <= margin2, jnp.exp(-inv_2sigma2 * nd2), 0.0
                )
            alpha = jnp.where(ok, op * shape, 0.0)
            # mask window rows outside this tile's run (lead-in overlap rows
            # belong to the previous tile; tail rows to the next)
            elem_start = start8_ref[t] + (b - block_off_ref[t]) * block
            local0 = elem_start - offsets_ref[t]
            row = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
            local = row + local0
            alpha = jnp.where(
                jnp.logical_and(local >= 0, local < counts_ref[t]), alpha, 0.0
            )

            q = 1.0 - alpha
            t_excl = _exclusive_cumprod_rows(q)  # (block, tp)
            weight = alpha * t_excl * trans  # trans broadcasts (1, tp)
            rgb = (
                u2f(
                    jnp.concatenate(
                        [w_rgb & 0xFF, (w_rgb >> 8) & 0xFF, (w_rgb >> 16) & 0xFF],
                        axis=1,
                    )
                )
                / COLOR_SCALE
            )  # (block, 3)
            # HIGHEST: default f32 dots run as bf16 MXU passes (1e-3 error);
            # the oracle-parity gate needs full f32 (tiny M=3 dot, cost ~0)
            out_ref[0, 0:3, :] += jnp.dot(
                rgb.T,
                weight,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            new_trans = trans * t_excl[block - 1 :, :] * q[block - 1 :, :]
            trans_ref[...] = new_trans
            out_ref[0, 3:4, :] = new_trans

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "block", "eps", "interpret"))
def pallas_blend_tiles(
    pair_w0: jnp.ndarray,  # (P + block, 1) u32 tile-sorted packed positions
    pair_w1: jnp.ndarray,  # (P + block, 1) u32 radius|opacity
    pair_w2: jnp.ndarray,  # (P + block, 1) u32 colors
    block_tile: jnp.ndarray,  # (n_blocks_cap,)
    block_first: jnp.ndarray,  # (n_blocks_cap,)
    start8: jnp.ndarray,  # (T+1,)
    block_off: jnp.ndarray,  # (T+1,)
    offsets: jnp.ndarray,  # (T+1,)
    counts: jnp.ndarray,  # (T,)
    cfg: RenderConfig,
    block: int = 128,
    eps: float = -1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite all tiles; returns (tile_color (T, tp, 3), tile_alpha (T, tp)).

    eps=0 disables early termination (bit-comparable to the oracle); the
    default -1 resolves to cfg.transmittance_eps, matching the reference's
    alpha >= 0.99 exit.
    """
    if eps < 0:
        eps = cfg.transmittance_eps
    tp = cfg.tile_pixels
    if tp % 128:
        raise ValueError("tile_pixels must be a multiple of 128 (tile_size 16 ok)")
    num_tiles = cfg.num_tiles
    n_blocks_cap = block_tile.shape[0]
    counts_padded = jnp.concatenate([counts, jnp.zeros((1,), counts.dtype)])

    def data_index(b, bt, bf, s8, bo, off, cn):
        t = bt[b]
        # trash blocks (t == num_tiles) pin to offset 0: the revisited window
        # lets the pipeline skip their DMAs entirely
        elem = jnp.where(t >= num_tiles, 0, s8[t] + (b - bo[t]) * block)
        return (pl.multiple_of(elem, 8), 0)

    word_spec = pl.BlockSpec((pl.Element(block), pl.Element(1)), data_index)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks_cap,),
        in_specs=[word_spec, word_spec, word_spec],
        out_specs=pl.BlockSpec(
            (1, 8, tp), lambda b, bt, bf, s8, bo, off, cn: (bt[b], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((1, tp), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_kernel(cfg, block, eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 8, tp), jnp.float32),
        interpret=interpret,
    )(block_tile, block_first, start8, block_off, offsets, counts_padded,
      pair_w0, pair_w1, pair_w2)

    out = out[:num_tiles]
    # tiles with no splats are never visited by the stream: mask them clear
    empty = (counts == 0)[:, None]
    tile_color = jnp.where(empty[..., None], 0.0, out[:, 0:3, :].transpose(0, 2, 1))
    tile_alpha = jnp.where(empty, 0.0, 1.0 - out[:, 3, :])
    return tile_color, tile_alpha


def render_tiles_pallas(
    splat_data_quantized: jnp.ndarray,
    binned: Binned | None,
    cfg: RenderConfig,
    block: int = 128,
    eps: float = -1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for render/compositor.render_tiles on TPU.

    `splat_data_quantized` is the UNSORTED (N, 8) output of
    projector.pack_splat_screen_data (already on the quantization grids);
    `binned` must come from bin_splats_packed(splat_data_quantized, cfg,
    block), or pass None to compute it here.
    """
    if binned is None or "pair_w0" not in binned:
        binned = bin_splats_packed(splat_data_quantized, cfg, block)
    tile_color, tile_alpha = pallas_blend_tiles(
        binned["pair_w0"],
        binned["pair_w1"],
        binned["pair_w2"],
        binned["block_tile"],
        binned["block_first"],
        binned["start8"],
        binned["block_off"],
        binned["offsets"],
        binned["counts"],
        cfg,
        block=block,
        eps=eps,
        interpret=interpret,
    )
    return tiles_to_image(tile_color, tile_alpha, cfg)
