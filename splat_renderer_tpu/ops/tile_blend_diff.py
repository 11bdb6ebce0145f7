"""Differentiable Pallas tile blend: custom-VJP forward + backward kernels.

The exact pipeline's Pallas kernel (ops/tile_blend.py) consumes QUANTIZED
packed words — zero-gradient by design (the grids are pipeline semantics).
Training-grade inverse rendering (render/diff.py) therefore ran on the XLA
scan compositor, which is ~8-10x slower than the Pallas forward and whose
autodiff backward doubles that (measured, benchmarks/probe_fit.py).

This module gives the diff path its own kernel pair over CONTINUOUS f32
record planes (binning.bin_planes_diff stream):

- forward: the streaming window fold of ops/tile_blend.py re-derived for f32
  planes, eps=0 (no saturation skip — truncation would bias gradients), with
  the scan path's `alpha <= 1 - 1e-7` clamp so both diff paths share
  semantics.  Emits (tile_color, tile_alpha, tile_depth): expected depth
  D = sum_i d_i a_i T_i rides the blend as a 4th premultiplied channel
  under the SAME weights as color (RGB-D training at kernel speed).

- backward: the standard differentiable-rasterizer blend adjoint (3DGS,
  Kerbl et al. 2023 — re-derived for a front-to-back single pass).  For
  pixel cotangents gC/gA and per-record alpha a_i, transmittance
  T_i = prod_{j<i}(1 - a_j):

      dL/drgb_i = gC * a_i T_i
      dL/da_i   = (gC . c_i) T_i - S_i / (1 - a_i) + gA T_fin / (1 - a_i)

  where S_i = sum_{k>i} (gC . c_k) a_k T_k is the suffix the classic
  implementation gets from a back-to-front second pass.  We instead use
  S_i = U_total - prefix_i with U_total = gC . C_tile — the tile's FINAL
  premultiplied color (a forward residual), so the backward runs in forward
  order and reuses the forward's window streaming verbatim: one inclusive
  cumsum (sublane Hillis-Steele, like the forward's cumprod) per panel plus
  carried (T, U) scratch rows.  alpha-chain backprop then yields d(cx, cy,
  radius, opacity) per record via lane reductions of the same (128, tp)
  panels.

  Each pair-stream record is ACTIVE in exactly one (tile, window): runs
  partition the stream and windows partition each run (binning.stream_tables),
  so the grad stream needs no scatter — each grid step writes its rows, and
  a boundary row shared by two tiles' windows (same stream block, consecutive
  grid steps) is accumulated via a masked add on revisit.

Gradient routing back to input order happens in XLA (the custom_vjp wrapper):
pair grads -> sort by rank (cap slots per record) -> segment-sum -> sort by
src -> input order.  Two sorts instead of P-scale scatters (8 cyc/elem on the
scalar core — CLAUDE.md rule).

Reference counterpart: none — the WebGPU pipeline is forward-only WGSL
(src/ComputeShaderRenderer.ts); this is rebuild-only capability.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..render.binning import bin_planes_diff, diff_fields
from ..render.blend import ellipse_cos_sin
from .tile_blend import _exclusive_cumprod_rows, _tile_pixel_coords

ALPHA_CAP = 1.0 - 1e-7  # shared with render/compositor.py differentiable mode


def _nfields(cfg: RenderConfig) -> int:
    # 8 isotropic, 10 oriented (+angle, ratio); depth is always LAST
    return len(diff_fields(cfg))


def _inclusive_cumsum_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 0 (sublanes) by Hillis-Steele
    doubling — the additive twin of _exclusive_cumprod_rows."""
    c = x.shape[0]
    assert (c & (c - 1)) == 0
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < c:
        x = x + jnp.where(row >= k, pltpu.roll(x, shift=k, axis=0), 0.0)
        k *= 2
    return x


def _window_fields(w_all: jnp.ndarray, g: int, nfields: int):
    """Slice one 128-record group's per-field (128, 1) columns out of the
    lane-transposed (128, groups) planes of a (groups, 128*nfields) f32
    window."""
    return [w_all[:, 128 * k : 128 * (k + 1)].T[:, g : g + 1] for k in range(nfields)]


def _group_alpha(cfg, cols, g_lo, cnt, px, py):
    """Continuous alpha panel for one group — the diff path's twin of the
    packed kernel's dequantized evaluation, matching blend.splat_alpha_planes
    (isotropic or oriented ellipse) + the diff clamp.  Returns the
    intermediates the backward reuses."""
    inv_2sigma2 = 0.5 / (cfg.sigma * cfg.sigma)
    margin2 = cfg.bounds_margin * cfg.bounds_margin
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    cx, cy, r, op, cr, cg, cb = cols[:7]
    local = g_lo + row
    ok = (local >= 0) & (local < cnt) & (r >= cfg.min_screen_radius)
    dx = px - cx  # (128, tp)
    dy = py - cy
    v = dict(cx=cx, cy=cy, r=r, op=op, cr=cr, cg=cg, cb=cb, dx=dx, dy=dy)
    if cfg.oriented:
        # splat_alpha_planes' oriented branch: distance in the screen-ellipse
        # frame, divide-free cutoff via the ratio-scaled metric
        ang, ratio = cols[7], cols[8]
        rr = jnp.maximum(ratio, 1e-3)
        ca, sa = ellipse_cos_sin(ang)
        u = ca * dx + sa * dy
        vr = (-sa * dx + ca * dy) * rr
        dist2 = u * u + vr * vr
        scale = r * rr
        v.update(ang=ang, ratio=ratio, rr=rr, ca=ca, sa=sa, u=u, vr=vr)
    else:
        dist2 = dx * dx + dy * dy
        scale = r
    scale2 = scale * scale
    inv_s2 = 1.0 / jnp.maximum(scale2, 1e-12)
    nd2 = dist2 * inv_s2
    shape = jnp.where(
        ok & (dist2 <= margin2 * scale2), jnp.exp(-inv_2sigma2 * nd2), 0.0
    )
    a_raw = op * shape
    a = jnp.minimum(a_raw, ALPHA_CAP)
    v.update(dist2=dist2, inv_s2=inv_s2, nd2=nd2, shape=shape, a_raw=a_raw,
             a=a, d=cols[-1])  # depth: always the stream's last section
    return v


def _make_fwd_kernel(cfg: RenderConfig, block: int):
    """Forward diff kernel: grid per window (flat layout), eps=0 — the
    structure of tile_blend._make_kernel with continuous f32 fields."""
    tp = cfg.tile_pixels
    num_tiles = cfg.num_tiles
    groups = block // 128
    nf = _nfields(cfg)

    def kernel(bt_ref, bf_ref, bwin_ref, bl0_ref, bcnt_ref, w_ref, out_ref, acc_ref):
        b = pl.program_id(0)
        t = bt_ref[b]
        is_trash = t >= num_tiles

        @pl.when(jnp.logical_and(bf_ref[b] == 1, jnp.logical_not(is_trash)))
        def _():
            # rows 0:4 = premultiplied [r, g, b, expected-depth] accum;
            # row 4 = transmittance carry; rows 5:8 spare (zero)
            acc_ref[0:4, :] = jnp.zeros((4, tp), jnp.float32)
            acc_ref[4:8, :] = jnp.concatenate(
                [jnp.ones((1, tp), jnp.float32), jnp.zeros((3, tp), jnp.float32)]
            )

        @pl.when(jnp.logical_not(is_trash))
        def _():
            px, py = _tile_pixel_coords(cfg, None, t)
            w_all = w_ref[:]
            local0 = bl0_ref[b]
            cnt = bcnt_ref[b]
            for g in range(groups):
                cols = _window_fields(w_all, g, nf)
                v = _group_alpha(cfg, cols, local0 + g * 128, cnt, px, py)
                a = v["a"]
                q = 1.0 - a
                trans = acc_ref[4:5, :]
                t_excl = _exclusive_cumprod_rows(q)
                weight = (a * t_excl) * trans  # (128, tp)
                # depth rides the blend as a 4th premultiplied channel:
                # D = sum_i d_i a_i T_i, the same weights as color (the
                # scan compositor's return_aux accumulation, compositor.py)
                rgbd = jnp.concatenate(
                    [v["cr"], v["cg"], v["cb"], v["d"]], axis=1
                )
                contrib = jax.lax.dot_general(
                    rgbd,
                    weight,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (4, tp)
                acc_ref[0:4, :] += contrib
                acc_ref[4:5, :] = trans * (t_excl[127:128, :] * q[127:128, :])

        nb = pl.num_programs(0)
        nxt = bt_ref[jnp.minimum(b + 1, nb - 1)]
        is_last = jnp.logical_or(b + 1 >= nb, nxt != t)

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_trash)))
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


def _make_bwd_kernel(cfg: RenderConfig, block: int):
    """Backward diff kernel (see module docstring for the math)."""
    tp = cfg.tile_pixels
    num_tiles = cfg.num_tiles
    groups = block // 128
    inv_2sigma2 = 0.5 / (cfg.sigma * cfg.sigma)
    nf = _nfields(cfg)

    def kernel(
        bt_ref, bf_ref, bwin_ref, bwout_ref, bl0_ref, bcnt_ref,
        w_ref,  # (groups, 128*nf) f32 stream window
        cot_ref,  # (1, 16, tp): gCr gCg gCb gA | Cr Cg Cb A | gD D (per tile)
        gout_ref,  # (groups, 128*nf) f32 grad window (block bwout_ref[b])
        carry_ref,  # VMEM (8, tp): row 0 = T carry, row 1 = U carry
    ):
        b = pl.program_id(0)
        t = bt_ref[b]
        is_trash = t >= num_tiles
        # first visit of this OUTPUT block (revisits are consecutive: the
        # only sharing is a run boundary inside a block, i.e. the previous
        # grid step)
        prev = bwout_ref[jnp.maximum(b - 1, 0)]
        first_visit = jnp.logical_or(b == 0, prev != bwout_ref[b])

        @pl.when(jnp.logical_and(bf_ref[b] == 1, jnp.logical_not(is_trash)))
        def _():
            carry_ref[0:1, :] = jnp.ones((1, tp), jnp.float32)
            carry_ref[1:2, :] = jnp.zeros((1, tp), jnp.float32)

        @pl.when(jnp.logical_not(is_trash))
        def _():
            px, py = _tile_pixel_coords(cfg, None, t)
            w_all = w_ref[:]
            local0 = bl0_ref[b]
            cnt = bcnt_ref[b]
            gC = cot_ref[0, 0:3, :]  # (3, tp)
            gA_row = cot_ref[0, 3:4, :]  # (1, tp)
            C_tile = cot_ref[0, 4:7, :]
            A_row = cot_ref[0, 7:8, :]
            gD_row = cot_ref[0, 8:9, :]  # expected-depth cotangent
            D_tile = cot_ref[0, 9:10, :]  # forward expected-depth residual
            # U_total = gC . C_tile + gD . D_tile ; T_fin = 1 - A (per px).
            # Depth rides the color algebra verbatim: D = sum d_i a_i T_i
            # is a 4th premultiplied channel, so the suffix-from-total
            # trick needs only the extended dot.
            u_tot = (jnp.sum(gC * C_tile, axis=0, keepdims=True)
                     + gD_row * D_tile)  # (1, tp)
            t_fin = 1.0 - A_row
            ga_sat = gA_row * t_fin  # the gA T_fin numerator, hoisted

            for g in range(groups):
                cols = _window_fields(w_all, g, nf)
                v = _group_alpha(cfg, cols, local0 + g * 128, cnt, px, py)
                a = v["a"]
                t_excl = _exclusive_cumprod_rows(1.0 - a)
                t_carry = carry_ref[0:1, :]
                u_carry = carry_ref[1:2, :]
                ti = t_excl * t_carry  # (128, tp) transmittance before i
                w_pan = (
                    v["cr"] * gC[0:1, :]
                    + v["cg"] * gC[1:2, :]
                    + v["cb"] * gC[2:3, :]
                    + v["d"] * gD_row
                )  # (128, tp) = gC . c_i + gD d_i
                at = a * ti
                u = w_pan * at
                incl = _inclusive_cumsum_rows(u) + u_carry
                denom = 1.0 - a  # >= 1e-7 by the clamp
                inv_denom = 1.0 / denom
                ga = w_pan * ti + (incl - u_tot + ga_sat) * inv_denom
                # clamp gate: where a_raw hit ALPHA_CAP, da/d(op*shape) = 0
                g_prod = jnp.where(v["a_raw"] < ALPHA_CAP, ga, 0.0)
                shape = v["shape"]
                g_op = jnp.sum(g_prod * shape, axis=1, keepdims=True)  # (128,1)
                g_shape = g_prod * v["op"]
                g_nd2 = g_shape * (-inv_2sigma2) * shape  # 0 outside support
                g_dist2 = g_nd2 * v["inv_s2"]
                # nd2 = dist2 / max(scale^2, eps): d/dscale_i = -2 nd2 /
                # scale_i per factor (gate at eps)
                g_sum_nd2 = jnp.sum(g_nd2 * v["nd2"], axis=1, keepdims=True)
                r = v["r"]
                if cfg.oriented:
                    rr, ca, sa = v["rr"], v["ca"], v["sa"]
                    s2_live = ((r * rr) * (r * rr) > 1e-12).astype(jnp.float32)
                    g_u = g_dist2 * 2.0 * v["u"]
                    g_vr = g_dist2 * 2.0 * v["vr"]
                    # dx/dy chain through the rotation (+ the ratio-scaled v)
                    ddx = g_u * ca + g_vr * (-sa * rr)
                    ddy = g_u * sa + g_vr * (ca * rr)
                    g_cx = jnp.sum(-ddx, axis=1, keepdims=True)
                    g_cy = jnp.sum(-ddy, axis=1, keepdims=True)
                    g_ca = jnp.sum(g_u * v["dx"] + g_vr * v["dy"] * rr,
                                   axis=1, keepdims=True)
                    g_sa = jnp.sum(g_u * v["dy"] - g_vr * v["dx"] * rr,
                                   axis=1, keepdims=True)
                    g_ang = -g_ca * sa + g_sa * ca
                    g_r = g_sum_nd2 * (-2.0) * s2_live / jnp.maximum(r, 1e-9)
                    # ratio reaches dist2 twice: vr = (.)*rr and scale = r*rr
                    g_rr = (
                        jnp.sum(g_vr * v["vr"], axis=1, keepdims=True) / rr
                        + g_sum_nd2 * (-2.0) * s2_live / rr
                    )
                    g_ratio = jnp.where(v["ratio"] >= 1e-3, g_rr, 0.0)
                else:
                    r2_live = (r * r > 1e-12).astype(jnp.float32)
                    g_cx = jnp.sum(g_dist2 * (-2.0) * v["dx"], axis=1,
                                   keepdims=True)
                    g_cy = jnp.sum(g_dist2 * (-2.0) * v["dy"], axis=1,
                                   keepdims=True)
                    g_r = g_sum_nd2 * (-2.0) * r2_live / jnp.maximum(r, 1e-9)
                g_cr = jnp.sum(gC[0:1, :] * at, axis=1, keepdims=True)
                g_cg = jnp.sum(gC[1:2, :] * at, axis=1, keepdims=True)
                g_cb = jnp.sum(gC[2:3, :] * at, axis=1, keepdims=True)
                g_d = jnp.sum(gD_row * at, axis=1, keepdims=True)

                # write this group's row of the grad window: (128, 1) columns
                # transpose to (1, 128) lane rows per field section
                vals = (g_cx, g_cy, g_r, g_op, g_cr, g_cg, g_cb)
                if cfg.oriented:
                    vals = vals + (g_ang, g_ratio)
                vals = vals + (g_d,)  # depth: last stream section
                for k, col in enumerate(vals):
                    mine = col.T  # (1, 128)
                    sec = slice(128 * k, 128 * (k + 1))
                    prev_row = gout_ref[g : g + 1, sec]
                    gout_ref[g : g + 1, sec] = jnp.where(
                        first_visit, mine, mine + prev_row
                    )

                # advance carries past this group
                q_all = t_excl[127:128, :] * (1.0 - a)[127:128, :]
                carry_ref[0:1, :] = t_carry * q_all
                carry_ref[1:2, :] = incl[127:128, :]

        # trash steps: leave gout untouched (their block is the dedicated
        # trash block; its contents are sliced off in XLA)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "interpret")
)
def _fwd_pallas(binned, cfg: RenderConfig, block: int, interpret: bool):
    tp = cfg.tile_pixels
    num_tiles = cfg.num_tiles
    n_blocks_cap = binned["block_tile"].shape[0]
    bw = block // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_blocks_cap,),
        in_specs=[pl.BlockSpec((bw, 128 * _nfields(cfg)), lambda b, bt, bf, bwin, bl0, bcnt: (bwin[b], 0))],
        out_specs=pl.BlockSpec(
            (1, 8, tp), lambda b, bt, bf, bwin, bl0, bcnt: (bt[b], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((8, tp), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_fwd_kernel(cfg, block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 8, tp), jnp.float32),
        interpret=interpret,
    )(
        binned["block_tile"], binned["block_first"], binned["block_window"],
        binned["block_local0"], binned["block_count"], binned["pair_f"],
    )
    out = out[:num_tiles]
    empty = (binned["counts"] == 0)[:, None]
    tile_color = jnp.where(empty[..., None], 0.0, out[:, 0:3, :].transpose(0, 2, 1))
    tile_depth = jnp.where(empty, 0.0, out[:, 3, :])
    tile_alpha = jnp.where(empty, 0.0, 1.0 - out[:, 4, :])
    return tile_color, tile_alpha, tile_depth


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "interpret")
)
def _bwd_pallas(
    binned, tile_color, tile_alpha, tile_depth, g_color, g_alpha, g_depth,
    cfg: RenderConfig, block: int, interpret: bool,
):
    """Run the backward kernel; returns the (rows_out, 128*nf) grad stream."""
    tp = cfg.tile_pixels
    num_tiles = cfg.num_tiles
    n_blocks_cap = binned["block_tile"].shape[0]
    bw = block // 128
    rows = binned["pair_f"].shape[0]
    nblocks = (rows + bw - 1) // bw
    rows_out = (nblocks + 1) * bw  # one extra: the trash block

    # cotangent + residual table, one (16, tp) row-block per tile:
    # [gC (3) | gA | C_tile (3) | A | gD | D | 6 spare]; row num_tiles
    # stays zero (trash).  16 rows keeps the sublane dim 8-aligned.
    cot = jnp.zeros((num_tiles + 1, 16, tp), jnp.float32)
    cot = cot.at[:num_tiles, 0:3, :].set(g_color.transpose(0, 2, 1))
    cot = cot.at[:num_tiles, 3, :].set(g_alpha)
    cot = cot.at[:num_tiles, 4:7, :].set(tile_color.transpose(0, 2, 1))
    cot = cot.at[:num_tiles, 7, :].set(tile_alpha)
    cot = cot.at[:num_tiles, 8, :].set(g_depth)
    cot = cot.at[:num_tiles, 9, :].set(tile_depth)

    is_real = binned["block_tile"] < num_tiles
    bwin_out = jnp.where(is_real, binned["block_window"], nblocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks_cap,),
        in_specs=[
            pl.BlockSpec((bw, 128 * _nfields(cfg)), lambda b, bt, bf, bwin, bwo, bl0, bcnt: (bwin[b], 0)),
            pl.BlockSpec((1, 16, tp), lambda b, bt, bf, bwin, bwo, bl0, bcnt: (bt[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (bw, 128 * _nfields(cfg)), lambda b, bt, bf, bwin, bwo, bl0, bcnt: (bwo[b], 0)
        ),
        scratch_shapes=[pltpu.VMEM((8, tp), jnp.float32)],
    )
    gout = pl.pallas_call(
        _make_bwd_kernel(cfg, block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out, 128 * _nfields(cfg)), jnp.float32),
        interpret=interpret,
    )(
        binned["block_tile"], binned["block_first"], binned["block_window"],
        bwin_out, binned["block_local0"], binned["block_count"],
        binned["pair_f"], cot,
    )
    return gout


def _route_grads(binned, gout, n: int, cfg: RenderConfig):
    """Pair-stream grads -> per-splat input-order grads: mask the inactive
    tail, sort by rank (cap slots per record, segment-sum by reshape), sort
    by src back to input order.  Two sorts, zero P-scale scatters."""
    cap = cfg.tiles_per_splat_cap
    p = n * cap
    rows = binned["pair_f"].shape[0]
    total = binned["offsets"][-1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    valid = iota_p < total  # stream rows past the runs hold garbage/trash

    cols = []
    for k in range(_nfields(cfg)):
        col = gout[:rows, 128 * k : 128 * (k + 1)].reshape(-1)[:p]
        cols.append(jnp.where(valid, col, 0.0))

    # rank sort: every record owns exactly `cap` pair slots
    res = jax.lax.sort(
        (binned["rank_sorted"],) + tuple(cols), num_keys=1, is_stable=False
    )
    per_rank = [c.reshape(n, cap).sum(axis=1) for c in res[1:]]
    # src sort: canonical order -> input order
    res2 = jax.lax.sort(
        (binned["src"],) + tuple(per_rank), num_keys=1, is_stable=False
    )
    return res2[1:]  # grads per DIFF_FIELDS, input order


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def blend_planes_pallas(
    cfg: RenderConfig,
    block: int,
    interpret: bool,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    radius: jnp.ndarray,
    opacity: jnp.ndarray,
    cr: jnp.ndarray,
    cg: jnp.ndarray,
    cb: jnp.ndarray,
    angle: jnp.ndarray,
    ratio: jnp.ndarray,
    depth: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable Pallas tile blend over continuous (N,) record planes.

    Returns (tile_color (T, tp, 3), tile_alpha (T, tp), tile_depth (T, tp))
    — feed color/alpha through compositor.tiles_to_image for the image;
    tile_depth is the alpha-weighted expected-depth sum D = sum d_i a_i T_i
    under the SAME blend weights as color (render_diff_gbuffer normalizes
    by alpha).  Gradients flow to every plane; depth's gradient flows
    through its VALUE in D only — compositing ORDER remains structure,
    like the tile assignment (standard differentiable-rasterization
    semantics, see render/diff.py).  angle/ratio participate only for
    oriented cfgs (isotropic profiles get zero gradients for them)."""
    out, _ = _diff_fwd(
        cfg, block, interpret,
        cx, cy, radius, opacity, cr, cg, cb, angle, ratio, depth,
    )
    return out


def _planes_dict(
    cx, cy, radius, opacity, cr, cg, cb, angle, ratio, depth
) -> Dict[str, jnp.ndarray]:
    return {
        "cx": cx, "cy": cy, "radius": radius, "opacity": opacity,
        "r": cr, "g": cg, "b": cb, "angle": angle, "ratio": ratio,
        "depth": depth,
    }


def _diff_fwd(cfg, block, interpret, *plane_args):
    planes = _planes_dict(*plane_args)
    binned = bin_planes_diff(planes, cfg, block)
    tile_color, tile_alpha, tile_depth = _fwd_pallas(
        binned, cfg, block, interpret)
    res = (binned, tile_color, tile_alpha, tile_depth,
           plane_args[0].shape[0])
    return (tile_color, tile_alpha, tile_depth), res


def _diff_bwd(cfg, block, interpret, res, cot):
    binned, tile_color, tile_alpha, tile_depth, n = res
    g_color, g_alpha, g_depth = cot
    gout = _bwd_pallas(
        binned, tile_color, tile_alpha, tile_depth,
        g_color, g_alpha, g_depth, cfg, block, interpret,
    )
    grads = _route_grads(binned, gout, n, cfg)
    g_cx, g_cy, g_r, g_op, g_cr, g_cg, g_cb = grads[:7]
    zero = jnp.zeros_like(g_cx)
    g_ang, g_ratio = (grads[7], grads[8]) if cfg.oriented else (zero, zero)
    # depth's VALUE gradient (through the expected-depth channel); its role
    # as the compositing ORDER stays structure (zero, like tile assignment).
    # NOTE: callers pass opacity/colors already clipped to [0, 1]
    # (render_diff), so the in-binning clip is the identity and needs no
    # gradient gating here.
    g_d = grads[-1]
    return (g_cx, g_cy, g_r, g_op, g_cr, g_cg, g_cb, g_ang, g_ratio, g_d)


blend_planes_pallas.defvjp(_diff_fwd, _diff_bwd)
