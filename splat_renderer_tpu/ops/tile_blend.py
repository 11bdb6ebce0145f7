"""Pallas TPU kernel: per-tile front-to-back splat compositing.

The hot loop of the whole engine — counterpart of the reference's per-pixel
compute compositor (src/ComputeShaderRenderer.ts:150-198, 8x8-thread
workgroups walking a tile's splat list with an `alpha >= 0.99` break).

TPU shape of the same computation — a *streaming* kernel over the tile-sorted
packed pair stream produced by render/binning.bin_splats_packed:

  The stream arrives as (rows, 128) u32 planes; the grid walks fixed-size
  windows of `block` records (block/128 rows).  Window bases are per-tile run
  starts rounded DOWN to a multiple of `block` (lead rows masked), so every
  window is a plain contiguous full-lane block — the round-1 (P, 1) layout
  paid ~25 ms/frame of strided DMA (one useful lane in 128); this one is
  bandwidth-trivial.  Empty tiles get no windows at all.

  In-kernel layout: RECORDS LIVE IN LANES, PIXELS IN SUBLANES.  Each window
  is processed as block/128 groups of 128 records; a group's fields unpack to
  (1, 128) vectors that broadcast against the (tile_pixels, 1) pixel columns
  into (tile_pixels, 128) alpha panels — no transpose of the stream, full
  VPU width everywhere.

  Per group: the exclusive transmittance prefix runs ALONG LANES by
  log-doubling (7 masked roll-multiplies), and the color fold is three
  lane-reductions of alpha-weighted (tp, 128) panels.

  The per-tile accumulator is a (tile_pixels, 4) VMEM scratch [r, g, b,
  transmittance] that lives across the tile's windows and is transposed into
  the (1, 8, tp) output block once, on the tile's LAST window (the out block
  is revisited across the tile's windows, so Mosaic flushes it to HBM exactly
  once per tile).

  Early termination: the reference's per-pixel `break` becomes a per-tile
  window-granular predicate — compute is skipped once every pixel's
  transmittance is below cfg.transmittance_eps (SURVEY.md section 7 "Early
  termination in a SIMD world"); the stream keeps flowing, so no dynamic
  control flow reaches the pipeline.

Order-correctness was bought entirely by the binner's rank-keyed pair sort
((tile, canonical rank) where rank = the record's row in the (depth_bits,
input index) record sort — see binning.bin_splats_packed): runs are exactly
depth-ordered with deterministic ties, so the kernel needs no sorting and no
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
from ..render.blend import ellipse_cos_sin
from ..render.compositor import tiles_to_image
from ..render.packing import (
    INV_ANGLE_SCALE,
    INV_COLOR_SCALE,
    INV_RATIO_SCALE,
)

PI = math.pi


def _exclusive_cumprod_rows(q: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along axis 0 (rows) via Hillis-Steele
    doubling: out[i] = prod_{j<i} q[j].  Row count must be a power of two
    (128 here).  Sublane rolls — lane-axis rolls measured ~3x slower."""
    c = q.shape[0]
    assert (c & (c - 1)) == 0, "row count must be a power of two"
    row = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
    x = jnp.where(row >= 1, pltpu.roll(q, shift=1, axis=0), 1.0)
    k = 1
    while k < c:
        x = x * jnp.where(row >= k, pltpu.roll(x, shift=k, axis=0), 1.0)
        k *= 2
    return x


def _acc_init(acc_ref, tp, with_depth):
    """Zero the channel rows, 1.0 the transmittance row, zero the spares.
    Channel rows: [r, g, b] (+ expected depth when with_depth); the
    transmittance row immediately follows the channels."""
    nc = 4 if with_depth else 3
    acc_ref[0:nc, :] = jnp.zeros((nc, tp), jnp.float32)
    acc_ref[nc:8, :] = jnp.concatenate(
        [jnp.ones((1, tp), jnp.float32), jnp.zeros((7 - nc, tp), jnp.float32)]
    )


def _blend_window(cfg, spec, eps, sat_every, w_all, acc_ref, local0, cnt, px,
                  py, with_depth=False, group=128):
    """Fold one `block`-record window (w_all: (block//128, lanes) u32 values)
    into the tile accumulator — shared by the flat (grid-per-window) and
    tile-major (grid-per-tile) kernels.

    Records arrive packed in lanes (contiguous full-lane DMA); one cheap vreg
    transpose per plane puts them in SUBLANES so per-record fields become
    (128, 1) columns that broadcast against the (1, tp) pixel rows
    (~30 ns/window, measured).

    with_depth (the G-buffer stream, binning with_depth=True): one extra
    trailing lane section holds each record's depth KEY; the kernel recovers
    f32 depth (bitcast of key & 0x7FFFFFFF — packing.depth_bits inverse for
    the positive depths projection emits) and folds alpha-weighted expected
    depth as a 4th MXU channel into acc row 3; transmittance moves to row 4
    (the layout the diff forward kernel already uses,
    ops/tile_blend_diff.py).

    group: records per PREDICATE group (power-of-two multiple of 128).
    Larger groups amortize the per-group fixed cost (~0.2 us of scalar
    predicate + saturation sync, benchmarks/probe_blend_iso.py) by running
    group/128 consecutive 128-record folds under ONE pl.when — each fold
    keeps the identical 7-step cumprod + MXU contraction, so the op
    sequence (and output) is BIT-identical to group=128 wherever no
    saturation skip fires; coarser saturation checks only ADD
    sub-threshold contributions (same semantics as sat_every).  NOTE: an
    earlier design stacked `sub` column slices into one (group, 1) vector
    — Mosaic cannot lower that sublane concatenate of lane-offset slices
    ("result/input offset mismatch on non-concat dimension", caught by
    drive_tpu_parity.check_blend_group on device)."""
    pos_scale, pos_offset = cfg.pos_scale, cfg.pos_offset
    inv_ps = 1.0 / pos_scale
    inv_2sigma2 = 0.5 / (cfg.sigma * cfg.sigma)
    margin2 = cfg.bounds_margin * cfg.bounds_margin
    assert group % 128 == 0 and (group & (group - 1)) == 0
    # group > window would make `groups` 0 below and every window silently
    # fold NOTHING (black frame, no error) — fail loudly instead (ADVICE r4)
    assert group <= w_all.shape[0] * 128, (
        f"blend group {group} exceeds the {w_all.shape[0] * 128}-record "
        "window (block); use group <= block"
    )
    sub = group // 128  # consecutive 128-record folds per predicate group
    groups = (w_all.shape[0] * 128) // group
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    nc = 4 if with_depth else 3  # accumulated channels; trans row follows

    if spec is None:
        tw_pos = w_all[:, 0:128].T  # (128, groups) u32
        tw_ro = w_all[:, 128:256].T
        tw_rgb = w_all[:, 256:384].T
        tw_d = w_all[:, 384:512].T if with_depth else None
    else:
        tw_pos = w_all[:, 0:128].T  # w_a: cy_rel:11 | cx_rel:11 | r:10
        tw_ro = None
        tw_rgb = w_all[:, 128:256].T
        tw_d = w_all[:, 256:384].T if with_depth else None

    def u2f(x):
        # Mosaic lacks a direct u32->f32 cast; all unpacked fields fit in
        # 21 bits, so hop through int32
        return x.astype(jnp.int32).astype(jnp.float32)

    for g in range(groups):
        # group-level skip: lead-in groups (before the run start), tail
        # groups (past the run end), and saturated-tile groups cost
        # nothing — a finer-grained version of the reference's per-pixel
        # break (src/ComputeShaderRenderer.ts:188-190)
        g_lo = local0 + g * group
        trans = acc_ref[nc : nc + 1, :]  # (1, tp)
        g_active = jnp.logical_and(g_lo + group > 0, g_lo < cnt)
        if g % sat_every == 0 and g > 0:
            # scalar saturation re-check (the caller's window-level
            # predicate already covered g == 0)
            g_active = jnp.logical_and(g_active, jnp.max(trans) > eps)

        @pl.when(g_active)
        def _(g=g, g_lo=g_lo):
          # `sub` consecutive 128-record folds under one predicate; each
          # fold re-reads the trans row its predecessor just wrote, so the
          # op sequence is exactly the group=128 one
          for j in range(sub):
            gi = g * sub + j
            f_lo = g_lo + j * 128
            trans = acc_ref[nc : nc + 1, :]  # (1, tp)
            w_pos = tw_pos[:, gi : gi + 1]  # (128, 1) u32
            w_rgb = tw_rgb[:, gi : gi + 1]

            if spec is None:
                w_ro = tw_ro[:, gi : gi + 1]
                # dequant by MULTIPLY only (packing.py INV_* rationale)
                cx = u2f(w_pos & 0xFFFF) * inv_ps - pos_offset
                cy = u2f(w_pos >> 16) * inv_ps - pos_offset
                r = u2f(w_ro & 0xFFFF) * inv_ps
            else:
                # tile-relative fields: the same grid points as the global
                # path shifted by the tile's padded origin, so dx/dy below
                # are bit-identical
                cx = u2f((w_pos >> 10) & 0x7FF) * inv_ps
                cy = u2f(w_pos >> 21) * inv_ps
                r = u2f(w_pos & 0x3FF) * inv_ps
            op = u2f(w_rgb >> 24) * INV_COLOR_SCALE
            # fold the run mask and the min-radius cull into the (128, 1)
            # opacity column — record-scale, not panel-scale
            local = f_lo + row
            ok = jnp.logical_and(
                jnp.logical_and(local >= 0, local < cnt),
                r >= cfg.min_screen_radius,
            )
            op = jnp.where(ok, op, 0.0)

            dx = px - cx  # (128, tp)
            dy = py - cy
            # The support-cutoff comparison must be ALL-MULTIPLY — divides /
            # reciprocals lower with different ulps in Mosaic vs XLA and flip
            # hard-cutoff pixels (blend.splat_alpha has the full story); the
            # divide survives only inside the exp argument.  Op sequence must
            # stay bit-identical to blend.splat_alpha.
            if cfg.oriented:
                # distance in the splat's screen-ellipse frame;
                # fixed-polynomial trig shared with blend.splat_alpha
                ang = u2f((w_ro >> 16) & 0xFF) * INV_ANGLE_SCALE - PI
                ratio = jnp.maximum(u2f(w_ro >> 24) * INV_RATIO_SCALE, 1e-3)
                ca, sa = ellipse_cos_sin(ang)
                u = ca * dx + sa * dy
                vr = (-sa * dx + ca * dy) * ratio
                d2 = u * u + vr * vr
                scale = r * ratio
            else:
                d2 = dx * dx + dy * dy
                scale = r
            scale2 = scale * scale
            # exp argument only: ONE record-scale (128, 1) coefficient
            # replaces the (128, tp) panel divide + multiply (same fold as
            # blend.splat_alpha_planes — op sequences must stay twinned)
            coef = -inv_2sigma2 / jnp.maximum(scale2, 1e-12)
            if cfg.opaque and cfg.quad:
                # reference-exact square coverage (src/Renderer.ts:95-131 —
                # the live path never discards on uv); op sequence mirrors
                # blend.splat_alpha_planes' quad branch exactly (both
                # compares against scale2 in the ratio-scaled metric)
                if cfg.oriented:
                    inside = (u * u <= scale2) & (vr * vr <= scale2)
                else:
                    inside = (dx * dx <= scale2) & (dy * dy <= scale2)
                shape = jnp.where(inside, 1.0, 0.0)
            elif cfg.opaque:
                # z-buffer semantics: nearest covering splat wins exactly
                # (front-to-back + alpha 1), src/Renderer.ts:189-201
                shape = jnp.where(d2 <= scale2, 1.0, 0.0)
            else:
                # disc support cutoff at bounds_margin * r (blend.py)
                shape = jnp.where(
                    d2 <= margin2 * scale2, jnp.exp(d2 * coef), 0.0
                )
            alpha = op * shape  # (128, tp)

            q = 1.0 - alpha
            # NOTE (measured, v5e, benchmarks/probe_tm.py): a log-space MXU
            # prefix (exp(Ltri @ log q)) replacing these roll-multiplies is a
            # 4.6x REGRESSION (81.6 vs 17.7 ms/frame) — two transcendentals
            # per (128, tp) panel element dwarf the 7 multiplies they save.
            t_excl = _exclusive_cumprod_rows(q)
            weight = (alpha * t_excl) * trans  # (1, tp) row bcast
            # color fold on the MXU: contract the 128 record rows —
            # (128, 3)^T x (128, tp), a K=128 contraction (the
            # (tp,128)x(128,3) N=3 form wastes the MXU: 6.8 ms/frame)
            rgb = jnp.concatenate(
                [
                    u2f(w_rgb & 0xFF),
                    u2f((w_rgb >> 8) & 0xFF),
                    u2f((w_rgb >> 16) & 0xFF),
                ],
                axis=1,
            ) * INV_COLOR_SCALE  # (128, 3)
            if with_depth:
                # depth rides the SAME contraction as a 4th channel
                # (bit-exact record depth, no quant grid)
                w_d = tw_d[:, gi : gi + 1]
                d = jax.lax.bitcast_convert_type(
                    w_d & jnp.uint32(0x7FFFFFFF), jnp.float32
                )
                rgb = jnp.concatenate([rgb, d], axis=1)  # (128, 4)
            contrib = jax.lax.dot_general(
                rgb,
                weight,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (nc, tp)
            acc_ref[0:nc, :] += contrib
            acc_ref[nc : nc + 1, :] = trans * (
                t_excl[127:128, :] * q[127:128, :]
            )


def _stream_spec(cfg, lanes, with_depth):
    """Resolve the pair stream's record layout from its lane width: returns
    two_word_spec(cfg) for the tile-relative 2-word layout, None for the
    global 3-word layout.  with_depth adds one trailing 128-lane section."""
    from ..render.binning import two_word_spec

    base_words = lanes // 128 - (1 if with_depth else 0)
    if base_words == 2:
        spec = two_word_spec(cfg)
        if spec is None:
            raise ValueError(
                "2-word pair stream but cfg does not allow the layout"
            )
        return spec
    if base_words != 3:
        raise ValueError(
            f"pair stream has {lanes} lanes ({lanes // 128} words) — "
            f"expected 2 or 3 payload words (+1 depth: {with_depth})"
        )
    return None


def _tile_pixel_coords(cfg, spec, t):
    """Per-tile pixel-center coordinates, pixels along LANES: (1, tp) px/py.

    Row-major within the tile: lane = y * tile_w + x (rectangular tiles
    supported — tile_w/tile_h are independent powers of two, so the
    mod/floordiv lower to lane bit ops)."""
    tp = cfg.tile_pixels
    tw, th = cfg.tile_w, cfg.tile_h
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    if spec is None:
        origin_x = ((t % cfg.tiles_x) * tw).astype(jnp.float32)
        origin_y = ((t // cfg.tiles_x) * th).astype(jnp.float32)
        px = origin_x + (lane % tw).astype(jnp.float32) + 0.5
        py = origin_y + (lane // tw).astype(jnp.float32) + 0.5
    else:
        # tile-local frame: pixel coords offset by the pad_rel origin shift
        # baked into the w_a fields (binning.two_word_spec)
        pad_px = spec["pad_rel"] / cfg.pos_scale
        px = (lane % tw).astype(jnp.float32) + (0.5 + pad_px)
        py = (lane // tw).astype(jnp.float32) + (0.5 + pad_px)
    return px, py


def _make_tile_kernel(cfg: RenderConfig, block: int, eps: float, spec,
                      sat_every: int, with_depth: bool = False,
                      group: int = 128):
    """Tile-major streaming kernel: ONE grid step per nonempty tile, manual
    double-buffered DMA over the tile's consecutive stream windows, and a
    while-loop saturation exit that stops both compute AND DMA.

    Motivation (measured, v5e, benchmarks/probe_blend2.py): the flat
    grid-per-window kernel pays ~1.8 us of Mosaic per-step scaffolding even
    for an EMPTY body — ~7 ms at the bench shape's 4037 windows.  Collapsing
    to ~1.4k tile steps cuts that floor ~3x, and saturated silhouette tiles
    stop fetching windows entirely (the flat kernel still DMA'd them)."""
    tp = cfg.tile_pixels
    num_tiles = cfg.num_tiles
    bw = block // 128
    tr = 4 if with_depth else 3  # transmittance accumulator row

    def kernel(
        tile_ref,  # (n_class,) tile id per slot (num_tiles = padding)
        win0_ref,  # (n_class,) first stream-window unit of the tile's run
        nwin_ref,  # (n_class,) number of windows
        local0_ref,  # (n_class,) win0*block - run offset (lead-in, <= 0)
        count_ref,  # (n_class,) run length
        w_hbm,  # (rows, lanes) u32 pair stream, stays in HBM
        out_ref,  # (1, 8, tp) block at row tile_ref[i]
        acc_ref,  # VMEM (8, tp)
        wbuf_ref,  # VMEM (2, bw, lanes) u32 double buffer
        sem_ref,  # DMA semaphores (2,)
    ):
        i = pl.program_id(0)
        t = tile_ref[i]

        @pl.when(t < num_tiles)
        def _():
            px, py = _tile_pixel_coords(cfg, spec, t)
            _acc_init(acc_ref, tp, with_depth)
            win0 = win0_ref[i]
            nw = nwin_ref[i]
            local0_t = local0_ref[i]
            cnt = count_ref[i]

            def dma(slot, w):
                row0 = pl.multiple_of((win0 + w) * bw, 8)
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(row0, bw), :],
                    wbuf_ref.at[slot],
                    sem_ref.at[slot],
                )

            dma(0, 0).start()

            def cond(state):
                w, live = state
                return jnp.logical_and(w < nw, live)

            def body(state):
                w, _ = state

                @pl.when(w + 1 < nw)
                def _():
                    dma((w + 1) % 2, w + 1).start()

                dma(w % 2, w).wait()
                _blend_window(
                    cfg, spec, eps, sat_every, wbuf_ref[w % 2], acc_ref,
                    local0_t + w * block, cnt, px, py, with_depth, group,
                )
                return w + 1, jnp.max(acc_ref[tr : tr + 1, :]) > eps

            final_w, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.bool_(eps < 1.0))
            )

            # early exit leaves exactly one DMA in flight (for window
            # final_w, started in the previous iteration — or the warm-up
            # when final_w == 0); drain it so the semaphore stays balanced
            @pl.when(final_w < nw)
            def _():
                dma(final_w % 2, final_w).wait()

            out_ref[0] = acc_ref[:]

    return kernel


def _make_tile_kernel_xp(cfg: RenderConfig, block: int, eps: float, spec,
                         sat_every: int, with_depth: bool = False,
                         group: int = 128):
    """Cross-tile-prefetch variant of _make_tile_kernel.

    In the base tile-major kernel each grid step issues its tile's FIRST
    window DMA and immediately waits it, so at ~600 records/tile (one window
    per tile at block=1024) nearly every step exposes the full DMA
    issue-to-complete latency serially — ~1-2 us x ~4k nonempty tiles is the
    multi-ms gap between the blend's measured time and its panel-work +
    group-overhead model (NOTES.md round 3).  Here each step prefetches the
    NEXT tile's window 0 before doing its own compute, so that latency hides
    under the current tile's panels:

      slots 0/1: window-0 stream, alternating by STEP parity — step i-1
                 starts slot i%2, step i waits it (VMEM scratch and DMA
                 semaphores persist across the sequential grid).
      slots 2/3: within-tile windows >= 1, double-buffered by window parity
                 (the base kernel's scheme, minus window 0).

    Semaphore discipline: every start is waited exactly once.  A step whose
    PREDECESSOR was a trash slot (or step 0) self-starts its window 0; a
    step never prefetches for a trash successor.  Listed slots are nonempty
    (nw >= 1, binning guarantees), trash slots do nothing.  Output is
    bit-identical to the base kernel — the fold order never changes, only
    DMA scheduling (device-gated in drive_tpu_parity / probe_blend_xp)."""
    tp = cfg.tile_pixels
    num_tiles = cfg.num_tiles
    bw = block // 128
    tr = 4 if with_depth else 3  # transmittance accumulator row

    def kernel(
        tile_ref,  # (n_class,) tile id per slot (num_tiles = padding)
        win0_ref,  # (n_class,) first stream-window unit of the tile's run
        nwin_ref,  # (n_class,) number of windows
        local0_ref,  # (n_class,) win0*block - run offset (lead-in, <= 0)
        count_ref,  # (n_class,) run length
        w_hbm,  # (rows, lanes) u32 pair stream, stays in HBM
        out_ref,  # (1, 8, tp) block at row tile_ref[i]
        acc_ref,  # VMEM (8, tp)
        wbuf_ref,  # VMEM (4, bw, lanes) u32: 0/1 window-0, 2/3 windows >= 1
        sem_ref,  # DMA semaphores (4,)
    ):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        t = tile_ref[i]

        @pl.when(t < num_tiles)
        def _():
            def dma_first(slot, w0u):
                row0 = pl.multiple_of(w0u * bw, 8)
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(row0, bw), :],
                    wbuf_ref.at[slot],
                    sem_ref.at[slot],
                )

            # self-start window 0 when no predecessor prefetched it (step 0,
            # or — defensively — a trash predecessor; trash is a suffix by
            # construction, so this is step 0 in practice)
            prev = jnp.maximum(i - 1, 0)
            prev_missing = jnp.logical_or(i == 0, tile_ref[prev] >= num_tiles)

            @pl.when(prev_missing)
            def _():
                dma_first(i % 2, win0_ref[i]).start()

            # prefetch the NEXT tile's window 0 before any compute
            nxt = jnp.minimum(i + 1, nb - 1)

            @pl.when(jnp.logical_and(i + 1 < nb, tile_ref[nxt] < num_tiles))
            def _():
                dma_first((i + 1) % 2, win0_ref[nxt]).start()

            px, py = _tile_pixel_coords(cfg, spec, t)
            _acc_init(acc_ref, tp, with_depth)
            win0 = win0_ref[i]
            nw = nwin_ref[i]
            local0_t = local0_ref[i]
            cnt = count_ref[i]

            def dma_in(w):  # windows >= 1
                row0 = pl.multiple_of((win0 + w) * bw, 8)
                slot = 2 + w % 2
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(row0, bw), :],
                    wbuf_ref.at[slot],
                    sem_ref.at[slot],
                )

            # window 1's fetch hides under window 0's compute
            @pl.when(nw > 1)
            def _():
                dma_in(1).start()

            dma_first(i % 2, win0).wait()
            # eps is static: the degenerate eps >= 1.0 config skips ALL
            # blending in the base kernel (while-loop init there is
            # eps < 1.0), so skip window 0 too — bit-identity with the base
            # kernel now holds for every eps, not just the meaningful
            # eps < 1.0 range (ADVICE r3).  The DMA wait above stays: the
            # window-0 fetch was already started and the semaphore must
            # balance.
            if eps < 1.0:
                _blend_window(
                    cfg, spec, eps, sat_every, wbuf_ref[i % 2], acc_ref,
                    local0_t, cnt, px, py, with_depth, group,
                )

            def cond(state):
                w, live = state
                return jnp.logical_and(w < nw, live)

            def body(state):
                w, _ = state

                @pl.when(w + 1 < nw)
                def _():
                    dma_in(w + 1).start()

                dma_in(w).wait()
                _blend_window(
                    cfg, spec, eps, sat_every, wbuf_ref[2 + w % 2], acc_ref,
                    local0_t + w * block, cnt, px, py, with_depth, group,
                )
                return w + 1, jnp.max(acc_ref[tr : tr + 1, :]) > eps

            final_w, _ = jax.lax.while_loop(
                cond,
                body,
                (
                    jnp.int32(1),
                    jnp.logical_and(
                        eps < 1.0, jnp.max(acc_ref[tr : tr + 1, :]) > eps
                    ),
                ),
            )

            # early exit leaves exactly one window->=1 DMA in flight
            @pl.when(final_w < nw)
            def _():
                dma_in(final_w).wait()

            out_ref[0] = acc_ref[:]

    return kernel


def _make_kernel(cfg: RenderConfig, block: int, eps: float, spec=None,
                 sat_every: int = 2, _strip: int = 0,
                 with_depth: bool = False, group: int = 128):
    """Kernel factory.  spec=None: global 3-word records (pos|ro|rgb lane
    thirds).  spec=two_word_spec(cfg): tile-relative 2-word records (w_a|rgb
    halves) — all coordinates tile-local, so the kernel touches no global
    screen positions at all (and one fewer plane transpose per window).

    sat_every: check the saturation predicate on every k-th 128-record group
    (always at window level too).  The (1,1) max-reduce inside pl.when costs
    ~0.1 us of scalar/vector sync per group; coarser checks trade a little
    skipped work on saturated silhouette tiles for less sync overhead.
    Rendering is exact for ANY value (skipping fewer groups only ADDS
    contributions below the transmittance floor).  Default 2: measured 1 ms
    faster than 1 in the fused 1M@1080p frame (the sync costs more than the
    extra compute it saves); eps=0 parity runs are unaffected (saturation
    never engages)."""
    tp = cfg.tile_pixels
    pos_scale, pos_offset = cfg.pos_scale, cfg.pos_offset
    inv_ps = 1.0 / pos_scale
    inv_2sigma2 = 0.5 / (cfg.sigma * cfg.sigma)
    margin2 = cfg.bounds_margin * cfg.bounds_margin
    num_tiles = cfg.num_tiles
    groups = block // 128
    tr = 4 if with_depth else 3  # transmittance accumulator row

    def kernel(
        block_tile_ref,  # (n_blocks_cap,) owning tile per grid block
        block_first_ref,  # (n_blocks_cap,) 1 at each tile's first block
        block_window_ref,  # (n_blocks_cap,) stream window index per block
        block_local0_ref,  # (n_blocks_cap,) window start - run start
        block_count_ref,  # (n_blocks_cap,) owning tile's run length
        w_ref,  # (block//128, 384) u32: lanes 0-127 pos, 128-255 ro, 256-383 rgb
        out_ref,  # (1, 8, tp): rows 0-2 color, 3 transmittance
        acc_ref,  # VMEM scratch (8, tp): rows 0-2 color, 3 transmittance
    ):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        t = block_tile_ref[b]
        is_trash = t >= num_tiles

        if _strip >= 3:  # perf diagnostics: bare step scaffolding
            return

        if _strip < 2:
            @pl.when(
                jnp.logical_and(block_first_ref[b] == 1, jnp.logical_not(is_trash))
            )
            def _():
                _acc_init(acc_ref, tp, with_depth)

        if _strip >= 1:
            live = jnp.logical_and(jnp.logical_not(is_trash), eps < -1e30)
        else:
            live = jnp.logical_and(
                jnp.logical_not(is_trash),
                jnp.max(acc_ref[tr : tr + 1, :]) > eps,
            )

        @pl.when(live)
        def _():
            px, py = _tile_pixel_coords(cfg, spec, t)
            _blend_window(
                cfg, spec, eps, sat_every, w_ref[:], acc_ref,
                block_local0_ref[b], block_count_ref[b], px, py, with_depth,
                group,
            )

        if _strip >= 2:
            return
        # flush on the tile's LAST window (the out block is revisited across
        # the tile's windows; Mosaic writes it to HBM once, on block change)
        nxt = block_tile_ref[jnp.minimum(b + 1, nb - 1)]
        is_last = jnp.logical_or(b + 1 >= nb, nxt != t)

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_trash)))
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block", "eps", "interpret", "sat_every", "_strip",
        "with_depth", "group",
    ),
)
def pallas_blend_tiles(
    pair_w: jnp.ndarray,  # (rows, 384) u32 fused record planes (pos|ro|rgb)
    block_tile: jnp.ndarray,  # (n_blocks_cap,)
    block_first: jnp.ndarray,  # (n_blocks_cap,)
    block_window: jnp.ndarray,  # (n_blocks_cap,)
    block_local0: jnp.ndarray,  # (n_blocks_cap,)
    block_count: jnp.ndarray,  # (n_blocks_cap,)
    counts: jnp.ndarray,  # (T,)
    cfg: RenderConfig,
    block: int = 1024,
    eps: float = -1.0,
    interpret: bool = False,
    sat_every: int = 2,
    _strip: int = 0,
    with_depth: bool = False,
    group: int = 128,
) -> Tuple[jnp.ndarray, ...]:
    """Composite all tiles; returns (tile_color (T, tp, 3), tile_alpha (T, tp))
    — plus tile_depth (T, tp) when with_depth (the binner must have packed
    the stream with_depth=True; depth is the trailing lane section).

    eps=0 disables early termination (bit-comparable to the oracle); the
    default -1 resolves to cfg.transmittance_eps, matching the reference's
    alpha >= 0.99 exit.
    """
    if eps < 0:
        eps = cfg.transmittance_eps
    tp = cfg.tile_pixels
    if tp % 8:
        raise ValueError("tile_pixels must be a multiple of 8")
    if block % 1024:
        raise ValueError(
            "block must be a multiple of 1024 (Mosaic block shapes need the "
            "sublane dim divisible by 8: windows are block/128 x 128)"
        )
    num_tiles = cfg.num_tiles
    n_blocks_cap = block_tile.shape[0]
    bw = block // 128
    lanes = pair_w.shape[1]  # 128 * payload words
    spec = _stream_spec(cfg, lanes, with_depth)

    def data_index(b, bt, bf, bwin, bl0, bcnt):
        return (bwin[b], 0)

    word_spec = pl.BlockSpec((bw, lanes), data_index)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_blocks_cap,),
        in_specs=[word_spec],
        out_specs=pl.BlockSpec(
            (1, 8, tp), lambda b, bt, bf, bwin, bl0, bcnt: (bt[b], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((8, tp), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_kernel(cfg, block, eps, spec, sat_every, _strip, with_depth,
                     group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 8, tp), jnp.float32),
        interpret=interpret,
    )(block_tile, block_first, block_window, block_local0, block_count, pair_w)

    out = out[:num_tiles]
    # tiles with no splats are never visited by the stream: mask them clear
    tr = 4 if with_depth else 3
    empty = (counts == 0)[:, None]
    tile_color = jnp.where(empty[..., None], 0.0, out[:, 0:3, :].transpose(0, 2, 1))
    tile_alpha = jnp.where(empty, 0.0, 1.0 - out[:, tr, :])
    if with_depth:
        tile_depth = jnp.where(empty, 0.0, out[:, 3, :])
        return tile_color, tile_alpha, tile_depth
    return tile_color, tile_alpha


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block", "eps", "interpret", "sat_every", "prefetch_next",
        "with_depth", "group",
    ),
)
def pallas_blend_tiles_tm(
    pair_w: jnp.ndarray,  # (rows, lanes) u32 pair stream (stays in HBM)
    tile_list: jnp.ndarray,  # (n_class,) tile id per slot (num_tiles = pad)
    tile_win0: jnp.ndarray,  # (n_class,)
    tile_nwin: jnp.ndarray,  # (n_class,)
    tile_local0: jnp.ndarray,  # (n_class,)
    tile_count: jnp.ndarray,  # (n_class,)
    counts: jnp.ndarray,  # (T,)
    cfg: RenderConfig,
    block: int = 1024,
    eps: float = -1.0,
    interpret: bool = False,
    sat_every: int = 2,
    prefetch_next: bool = False,
    with_depth: bool = False,
    group: int = 128,
) -> Tuple[jnp.ndarray, ...]:
    """Tile-major variant of pallas_blend_tiles: grid = nonempty tiles,
    manual double-buffered DMA over each tile's windows (see
    _make_tile_kernel).  Tiles listed beyond the table are NOT rendered —
    the caller masks them (render_tiles_pallas's capacity protocol).

    prefetch_next: cross-tile window-0 prefetch (_make_tile_kernel_xp) —
    hides the per-tile DMA issue latency under the previous tile's compute;
    bit-identical output.

    with_depth: G-buffer stream (see pallas_blend_tiles) — also returns
    tile_depth."""
    if eps < 0:
        eps = cfg.transmittance_eps
    tp = cfg.tile_pixels
    if tp % 8:
        raise ValueError("tile_pixels must be a multiple of 8")
    if block % 1024:
        raise ValueError("block must be a multiple of 1024")
    num_tiles = cfg.num_tiles
    n_class = tile_list.shape[0]
    bw = block // 128
    lanes = pair_w.shape[1]
    spec = _stream_spec(cfg, lanes, with_depth)

    nbuf = 4 if prefetch_next else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_class,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, tp), lambda i, tl, w0, nw, l0, c: (tl[i], 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((8, tp), jnp.float32),
            pltpu.VMEM((nbuf, bw, lanes), jnp.uint32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    make = _make_tile_kernel_xp if prefetch_next else _make_tile_kernel
    out = pl.pallas_call(
        make(cfg, block, eps, spec, sat_every, with_depth, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 8, tp), jnp.float32),
        interpret=interpret,
    )(tile_list, tile_win0, tile_nwin, tile_local0, tile_count, pair_w)

    out = out[:num_tiles]
    # unrendered rows: empty tiles AND nonempty tiles whose slot fell beyond
    # the capacity class (the caller re-renders at a bigger class)
    tr = 4 if with_depth else 3
    nz = counts > 0
    slot = jnp.cumsum(nz.astype(jnp.int32)) - 1
    ok = (nz & (slot < n_class))[:, None]
    tile_color = jnp.where(ok[..., None], out[:, 0:3, :].transpose(0, 2, 1), 0.0)
    tile_alpha = jnp.where(ok, 1.0 - out[:, tr, :], 0.0)
    if with_depth:
        tile_depth = jnp.where(ok, out[:, 3, :], 0.0)
        return tile_color, tile_alpha, tile_depth
    return tile_color, tile_alpha


def render_tiles_pallas(
    splat_data_quantized: jnp.ndarray | None,
    binned: Binned | None,
    cfg: RenderConfig,
    block: int = 1024,
    eps: float = -1.0,
    interpret: bool = False,
    max_blocks: int | None = None,
    return_stats: bool = False,
    sat_every: int = 2,
    kernel: str = "flat",
    return_tiles: bool = False,
    class_caps: Tuple[int, int] | None = None,
    with_depth: bool = False,
    group: int = 128,
) -> jnp.ndarray:
    """Drop-in replacement for render/compositor.render_tiles on TPU.

    with_depth: G-buffer mode — the stream carries a trailing depth section
    (binning with_depth=True; computed here when binned is None) and the
    kernel folds alpha-weighted expected depth as a 4th channel.  Returns
    (tile_color, tile_alpha, tile_depth) with return_tiles, else the
    {"rgb", "depth", "alpha"} image dict (depth premultiplied — the caller
    normalizes, pipeline.render_gbuffer).

    `splat_data_quantized` is the UNSORTED (N, 10) output of
    projector.splat_screen_records (already on the quantization grids);
    `binned` must come from bin_splats_packed(splat_data_quantized, cfg,
    block), or pass None to compute it here.

    kernel: "flat" = grid-per-window (pallas_blend_tiles), "tile" =
    grid-per-nonempty-tile with manual double-buffered DMA
    (pallas_blend_tiles_tm), "tile_xp" = tile-major with cross-tile
    window-0 prefetch (_make_tile_kernel_xp) — all produce identical
    images; they differ only in per-step overhead / DMA scheduling.

    max_blocks: static grid-capacity class, in WINDOW units for the flat
    kernel and NONEMPTY-TILE units for the tile kernel.  The safe worst-case
    bound pays Mosaic's per-grid-step floor (~1.8 us/step measured) for
    thousands of trash steps; a steady-state caller (Engine, bench) sizes
    this to the scene's observed usage instead.  Tiles beyond the capacity
    render as empty and are flagged in the returned stats — the caller
    re-renders at a bigger class (capacity-growth protocol, pipeline.Engine).
    None = the safe bound (never overflows).
    """
    if kernel not in ("flat", "tile", "tile_xp"):
        # a typo'd kernel string must never silently time the wrong kernel
        # in an A/B probe (ADVICE r3)
        raise ValueError(f"unknown blend kernel {kernel!r}; "
                         "expected 'flat', 'tile', or 'tile_xp'")
    if binned is None or "pair_w" not in binned:
        binned = bin_splats_packed(
            splat_data_quantized, cfg, block, class_caps=class_caps,
            with_depth=with_depth,
        )
    tile_depth = None
    if kernel in ("tile", "tile_xp"):
        mt = cfg.num_tiles if max_blocks is None else max_blocks
        res = pallas_blend_tiles_tm(
            binned["pair_w"],
            binned["tile_list"][:mt],
            binned["tile_win0"][:mt],
            binned["tile_nwin"][:mt],
            binned["tile_local0"][:mt],
            binned["tile_count"][:mt],
            binned["counts"],
            cfg,
            block=block,
            eps=eps,
            interpret=interpret,
            sat_every=sat_every,
            prefetch_next=(kernel == "tile_xp"),
            with_depth=with_depth,
            group=group,
        )
        tile_color, tile_alpha = res[0], res[1]
        if with_depth:
            tile_depth = res[2]
        used = binned["tiles_used"]
        overflow = used > mt
    else:
        mb = binned["block_tile"].shape[0] if max_blocks is None else max_blocks
        res = pallas_blend_tiles(
            binned["pair_w"],
            binned["block_tile"][:mb],
            binned["block_first"][:mb],
            binned["block_window"][:mb],
            binned["block_local0"][:mb],
            binned["block_count"][:mb],
            binned["counts"],
            cfg,
            block=block,
            eps=eps,
            interpret=interpret,
            sat_every=sat_every,
            with_depth=with_depth,
            group=group,
        )
        tile_color, tile_alpha = res[0], res[1]
        if with_depth:
            tile_depth = res[2]
        used = binned["block_off"][-1]
        overflow = used > mb
        if max_blocks is not None:
            # tiles whose last window fell beyond the capacity class hold
            # partial accumulations: render them empty (background), never
            # garbage
            ok = binned["block_off"][1:] <= mb
            tile_color = jnp.where(ok[:, None, None], tile_color, 0.0)
            tile_alpha = jnp.where(ok[:, None], tile_alpha, 0.0)
            if tile_depth is not None:
                tile_depth = jnp.where(ok[:, None], tile_depth, 0.0)
    if return_tiles:
        out = (tile_color, tile_alpha)
        if with_depth:
            out = out + (tile_depth,)
    elif with_depth:
        from ..render.compositor import tiles_to_plane

        out = {
            "rgb": tiles_to_image(tile_color, tile_alpha, cfg),
            "depth": tiles_to_plane(tile_depth, cfg),
            "alpha": tiles_to_plane(tile_alpha, cfg),
        }
    else:
        out = tiles_to_image(tile_color, tile_alpha, cfg)
    if return_stats:
        return out, _blend_stats(binned, used, overflow)
    return out


def _blend_stats(binned: Binned, used, overflow) -> dict:
    """Stats for the caller's capacity protocols: blend window/tile usage
    plus the binner's footprint-class census (pipeline.Engine sizes its
    pair class_caps from these and re-renders on either overflow)."""
    stats = {"blocks_used": used, "overflow": overflow}
    if "class_counts" in binned:
        stats["class_counts"] = binned["class_counts"]
        stats["class_overflow"] = binned["class_overflow"]
    return stats
