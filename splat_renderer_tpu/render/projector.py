"""Splat projection: world space -> screen space, depth, radius, bounds.

Counterpart of src/SplatProjector.ts:34-133 (one WGSL thread per splat); here
each field is computed for the whole (N,) batch as full-lane elementwise
plane math.

TPU layout note (measured, benchmarks/probe_project.py): (N, 3)/(N, 4)
intermediates are lane-padded toward the 128-lane tile, so the obvious
"hom @ view_proj.T" formulation moves ~40x the useful bytes — column slices
of a (1M, 3) array alone cost 3.06 ms, more than the whole stage's budget.
Everything here therefore runs on (N,) PLANES (points/properties.py): the
4x4 matrix contributes 16 scalars, the "matmul" is 12 fused multiply-adds.
After the planes rewrite the stage is ~6x faster (3.7 -> 0.6 ms @1M, v5e).

Output is a structure-of-planes dict instead of the reference's packed
32-byte ProjectedSplat record; the two conflicting layouts noted in SURVEY.md
section 2.4 item 2 collapse into named fields.
"""

from __future__ import annotations

import math as _math
from typing import Dict

import jax.numpy as jnp

from ..config import RenderConfig
from ..points.properties import Splats

Projected = Dict[str, jnp.ndarray]


def project_planes(
    view_proj: jnp.ndarray,  # (4, 4)
    cam_pos: jnp.ndarray,  # (3,)
    px: jnp.ndarray,  # (N,)
    py: jnp.ndarray,  # (N,)
    pz: jnp.ndarray,  # (N,)
    radii: jnp.ndarray,  # (N,)
    cfg: RenderConfig,
) -> Projected:
    """Project all splats; returns a dict of (N,) planes:

    - cx, cy: screen-space splat center (pixels)
    - depth: camera-space distance (src/SplatProjector.ts:77)
    - radius: max screen-space radius over 6 axial offsets (:91-113),
      capped so the padded footprint fits cfg.tiles_per_splat_cap tiles
    - radius_raw: pre-cap radius (for clamp statistics)
    - valid: in front of the camera.  The reference never culls; without
      a near-plane test a splat behind the eye would projectively wrap.  We
      mark it invalid (divergence documented; invalid splats get depth=inf
      and are dropped by binning).
    - clip0..clip3: the center's clip coordinates (reused by the oriented
      appearance path)
    """
    vp = view_proj
    clip = [vp[j, 0] * px + vp[j, 1] * py + vp[j, 2] * pz + vp[j, 3]
            for j in range(4)]
    w_center = clip[3]
    safe_w = jnp.where(jnp.abs(w_center) < 1e-8, 1e-8, w_center)
    half_w = 0.5 * cfg.width
    half_h = 0.5 * cfg.height
    cx = (clip[0] / safe_w + 1.0) * half_w
    cy = (1.0 - clip[1] / safe_w) * half_h
    dx, dy, dz = px - cam_pos[0], py - cam_pos[1], pz - cam_pos[2]
    depth = jnp.sqrt(dx * dx + dy * dy + dz * dz)

    # 6 axial offsets (+-r along each world axis): their clip coordinates are
    # clip_center +- r * VP_column, so no extra matmuls or an (N, 6, 3)
    # probe batch are needed — same max-over-6 semantics as
    # src/SplatProjector.ts:91-113 at a sixth of the cost
    screen_radius = jnp.zeros_like(depth)
    valid = w_center > 1e-6
    for axis in range(3):
        col = vp[:, axis]  # clip-space delta per unit world axis step
        for sign in (1.0, -1.0):
            sr = sign * radii
            wp = clip[3] + sr * col[3]
            valid = valid & (wp > 1e-6)
            swp = jnp.where(jnp.abs(wp) < 1e-8, 1e-8, wp)
            sx = ((clip[0] + sr * col[0]) / swp + 1.0) * half_w
            sy = (1.0 - (clip[1] + sr * col[1]) / swp) * half_h
            ddx = sx - cx
            ddy = sy - cy
            screen_radius = jnp.maximum(
                screen_radius, jnp.sqrt(ddx * ddx + ddy * ddy)
            )
    # Cap the screen radius so the padded bounds box always fits inside
    # tiles_per_splat_cap tiles: bbox side 2*margin*r spans at most
    # floor(sqrt(cap)) tiles when r <= (k-1)*tile_size / (2*margin).
    # Without this, over-cap footprints would have tiles silently dropped by
    # the binner — an oracle-invisible divergence; clamping the radius in the
    # record itself keeps every compositor (oracle included) consistent.
    # (The reference has the same pathology class and merely warns,
    # src/GPUTileBinner.ts:265-281.)
    r_max = cfg.r_cap
    radius_raw = jnp.where(valid, screen_radius, 0.0)  # pre-clamp, for stats
    screen_radius = jnp.minimum(screen_radius, r_max)
    screen_radius = jnp.where(valid, screen_radius, 0.0)
    depth = jnp.where(valid, depth, jnp.inf)
    return {
        "cx": cx,
        "cy": cy,
        "depth": depth,
        "radius": screen_radius,
        "radius_raw": radius_raw,
        "valid": valid,
        "clip0": clip[0],
        "clip1": clip[1],
        "clip3": clip[3],
    }


def project_splats(
    view_proj: jnp.ndarray,  # (4, 4)
    cam_pos: jnp.ndarray,  # (3,)
    positions: jnp.ndarray,  # (N, 3)
    radii: jnp.ndarray,  # (N,)
    cfg: RenderConfig,
) -> Projected:
    """AoS-compatibility wrapper over project_planes for (N, 3) positions:
    returns the round-1 dict shape (center (N, 2), bounds_min/max (N, 2), ...).
    Test/diagnostic API — the render path uses project_planes directly."""
    p = project_planes(
        view_proj, cam_pos,
        positions[:, 0], positions[:, 1], positions[:, 2], radii, cfg,
    )
    center = jnp.stack([p["cx"], p["cy"]], axis=-1)
    padded = (p["radius"] * cfg.bounds_margin)[:, None]
    return {
        "center": center,
        "depth": p["depth"],
        "radius": p["radius"],
        "radius_raw": p["radius_raw"],
        "bounds_min": center - padded,
        "bounds_max": center + padded,
        "valid": p["valid"],
    }


def shade_planes(
    splats: Splats,
    view_proj: jnp.ndarray,  # (4, 4)
    cam_pos: jnp.ndarray,  # (3,)
    cfg: RenderConfig,
) -> Dict[str, jnp.ndarray]:
    """Projection + appearance as CONTINUOUS (N,) planes — the float values
    screen_planes snaps onto the fixed-point record grids.

    Split out so the differentiable path (render/diff.py) can render from the
    same projection/lighting/ellipse math without the quantization (round /
    int casts have zero gradient).  Returns {cx, cy, radius, opacity, r, g,
    b, depth, angle, ratio} — the unquantized render record fields.

    Lighting: litColor = color * (ambient + diffuse * max(dot(n, L), 0))
    (src/ComputeShaderRenderer.ts:143-145) depends only on per-splat normals,
    so it moves out of the per-pixel loop entirely — the reference recomputes
    it per (pixel, splat) pair.
    """
    proj = project_planes(
        view_proj, cam_pos,
        splats["px"], splats["py"], splats["pz"], splats["radius"], cfg,
    )
    nx, ny, nz = splats["nx"], splats["ny"], splats["nz"]

    light = jnp.asarray(cfg.light_dir, dtype=nx.dtype)
    light = light / jnp.linalg.norm(light)
    diffuse = jnp.maximum(
        nx * light[0] + ny * light[1] + nz * light[2], 0.0
    )
    lamb = cfg.light_ambient + cfg.light_diffuse * diffuse

    ell_radius = proj["radius"]
    if cfg.oriented and cfg.ellipse == "ewa":
        # True perspective screen covariance of the world-space disc (EWA
        # splatting, Zwicker et al. 2001, specialized to a flat disc):
        # a disc of radius r in the tangent plane of unit normal n has world
        # covariance r^2 (I - n n^T); under the screen Jacobian J (2x3,
        # evaluated at the center) its image covariance is
        #   M = r^2 (J J^T - (J n)(J n)^T).
        # Eigendecomposing the 2x2 M gives (major, minor, minor-axis angle),
        # quantized onto the SAME (r_fx, ratio8, ang8) record grids the
        # foreshorten mode uses — downstream stays byte-identical.
        # Replaces the reference's isotropic max-over-6-offsets estimate
        # (src/SplatProjector.ts:91-113) when enabled.
        vp = view_proj
        w = proj["clip3"]
        sw = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        inv_w2 = 1.0 / (sw * sw)
        half_w = 0.5 * cfg.width
        half_h = 0.5 * cfg.height
        # unit normal (defensive)
        nlen = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-8)
        ux, uy, uz = nx / nlen, ny / nlen, nz / nlen
        # J rows: d sx / dp_k = Wh (vp0k w - clip0 vp3k)/w^2,
        #         d sy / dp_k = -Hh (vp1k w - clip1 vp3k)/w^2
        j0 = [half_w * (vp[0, k] * w - proj["clip0"] * vp[3, k]) * inv_w2
              for k in range(3)]
        j1 = [-half_h * (vp[1, k] * w - proj["clip1"] * vp[3, k]) * inv_w2
              for k in range(3)]
        a00 = j0[0] * j0[0] + j0[1] * j0[1] + j0[2] * j0[2]
        a01 = j0[0] * j1[0] + j0[1] * j1[1] + j0[2] * j1[2]
        a11 = j1[0] * j1[0] + j1[1] * j1[1] + j1[2] * j1[2]
        jn0 = j0[0] * ux + j0[1] * uy + j0[2] * uz
        jn1 = j1[0] * ux + j1[1] * uy + j1[2] * uz
        r2 = splats["radius"] * splats["radius"]
        m00 = r2 * (a00 - jn0 * jn0)
        m01 = r2 * (a01 - jn0 * jn1)
        m11 = r2 * (a11 - jn1 * jn1)
        # closed-form 2x2 symmetric eigendecomposition
        half_tr = 0.5 * (m00 + m11)
        half_df = 0.5 * (m00 - m11)
        root = jnp.sqrt(half_df * half_df + m01 * m01)
        lam_hi = jnp.maximum(half_tr + root, 0.0)
        lam_lo = jnp.maximum(half_tr - root, 0.0)
        major = jnp.sqrt(lam_hi)
        minor = jnp.sqrt(lam_lo)
        # minor-axis direction = eigenvector of lam_lo: (m01, lam_lo - m00),
        # with the better-conditioned alternative when m01 ~ 0 and the minor
        # axis is x-aligned (m00 < m11): fall back to (lam_lo - m11, m01)
        # swapped components... arctan2 of the primary form is stable except
        # when both components vanish (isotropic M) where angle is arbitrary.
        angle = jnp.arctan2(lam_lo - m00, m01)
        major_c = jnp.minimum(major, cfg.r_cap)
        ell_radius = jnp.where(proj["valid"], major_c, 0.0)
        ratio = jnp.clip(minor / jnp.maximum(major, 1e-8), 0.05, 1.0)
    elif cfg.oriented:
        # screen ellipse of a surface-oriented disc: minor axis along the
        # screen projection of the normal, minor/major = |n . view| —
        # a small-splat approximation of the reference's tangent-frame quads
        # (src/Renderer.ts:90-117), which foreshorten the same way
        vx = splats["px"] - cam_pos[0]
        vy = splats["py"] - cam_pos[1]
        vz = splats["pz"] - cam_pos[2]
        vn = jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-8)
        cos_view = (nx * vx + ny * vy + nz * vz) / vn
        # tip = position + radius * normal, projected with the same clip
        # algebra as the 6-offset radius (clip_tip = clip + r*(VP @ n))
        r = splats["radius"]
        vp = view_proj
        tc0 = proj["clip0"] + r * (vp[0, 0] * nx + vp[0, 1] * ny + vp[0, 2] * nz)
        tc1 = proj["clip1"] + r * (vp[1, 0] * nx + vp[1, 1] * ny + vp[1, 2] * nz)
        tc3 = proj["clip3"] + r * (vp[3, 0] * nx + vp[3, 1] * ny + vp[3, 2] * nz)
        stw = jnp.where(jnp.abs(tc3) < 1e-8, 1e-8, tc3)
        tip_x = (tc0 / stw + 1.0) * (0.5 * cfg.width)
        tip_y = (1.0 - tc1 / stw) * (0.5 * cfg.height)
        angle = jnp.arctan2(tip_y - proj["cy"], tip_x - proj["cx"])
        ratio = jnp.clip(jnp.abs(cos_view), 0.05, 1.0)
    else:
        angle = jnp.zeros_like(nx)
        ratio = jnp.ones_like(nx)

    opacity = splats["opacity"]
    if cfg.aa_dilation > 0.0 and not cfg.opaque:
        # Mip-splatting-style anti-aliasing (see config.aa_dilation): the
        # record's screen Gaussian has axis variances lam1 = (sigma*r)^2,
        # lam2 = (sigma*r*ratio)^2 (blend.splat_alpha_planes); convolving
        # with an isotropic pixel low-pass of variance s adds s to both
        # eigenvalues, and opacity picks up sqrt(det/det') so the integral
        # over the screen is unchanged.  Record-domain only — the blend
        # kernels never change, and the oracle consumes the same dilated
        # record, so parity gates keep holding verbatim.  (Gradient note:
        # d(comp)/d(radius) diverges as radius -> 0, like every 3DGS AA
        # rasterizer — fits keep radii away from exact zero.)
        s2 = cfg.sigma * cfg.sigma
        lam1 = s2 * ell_radius * ell_radius
        lam2 = lam1 * ratio * ratio
        lam1d = lam1 + cfg.aa_dilation
        lam2d = lam2 + cfg.aa_dilation
        alive = ell_radius > 0.0  # never resurrect culled splats
        opacity = jnp.where(
            alive, opacity * jnp.sqrt((lam1 / lam1d) * (lam2 / lam2d)), opacity
        )
        # re-cap: the dilated major axis may exceed r_cap by up to
        # sqrt(aa)/sigma px; the cap must stay a record invariant (the
        # binner's footprint budget and the 2-word layout both assume it)
        ell_radius = jnp.where(
            alive, jnp.minimum(jnp.sqrt(lam1d / s2), cfg.r_cap), 0.0
        )
        ratio = jnp.where(
            alive, jnp.sqrt(lam2d / lam1d), ratio
        )

    return {
        "cx": proj["cx"],
        "cy": proj["cy"],
        "radius": ell_radius,
        "opacity": opacity,
        "r": splats["cr"] * lamb,
        "g": splats["cg"] * lamb,
        "b": splats["cb"] * lamb,
        "depth": proj["depth"],
        "angle": angle,
        "ratio": ratio,
    }


def screen_planes(
    splats: Splats,
    view_proj: jnp.ndarray,  # (4, 4)
    cam_pos: jnp.ndarray,  # (3,)
    cfg: RenderConfig,
) -> Dict[str, jnp.ndarray]:
    """Projection + appearance + fixed-point quantization, all (N,) planes.

    THE single implementation both record paths share: snaps shade_planes'
    continuous values onto the integer grid columns of the render record
    (render/packing.py grids) — cx_fx / cy_fx / r_fx (u32, 1/pos_scale px),
    op8/r8/g8/b8/ang8/ratio8 (u32, u8 grids) plus depth (f32).  The
    packed-words fast path and the (N, 10) record builder both consume these,
    so they quantize identically (bit-equality is test-asserted).
    """
    from .packing import ANGLE_SCALE, COLOR_SCALE, POS_MAX, RATIO_SCALE

    c = shade_planes(splats, view_proj, cam_pos, cfg)
    ps, po = cfg.pos_scale, cfg.pos_offset
    q = lambda v: jnp.round(jnp.clip((v + po) * ps, 0, POS_MAX)).astype(jnp.uint32)
    c8 = lambda v: jnp.round(jnp.clip(v, 0.0, 1.0) * COLOR_SCALE).astype(jnp.uint32)
    return {
        "cx_fx": q(c["cx"]),
        "cy_fx": q(c["cy"]),
        "r_fx": jnp.round(jnp.clip(c["radius"] * ps, 0, POS_MAX)).astype(
            jnp.uint32
        ),
        "op8": c8(c["opacity"]),
        "r8": c8(c["r"]),
        "g8": c8(c["g"]),
        "b8": c8(c["b"]),
        "ang8": (
            jnp.round((c["angle"] + _math.pi) * ANGLE_SCALE).astype(jnp.int32) % 256
        ).astype(jnp.uint32),
        "ratio8": jnp.round(
            jnp.clip(c["ratio"], 1.0 / RATIO_SCALE, 1.0) * RATIO_SCALE
        ).astype(jnp.uint32),
        "depth": c["depth"],
    }


def splat_screen_words(
    splats: Splats,
    view_proj: jnp.ndarray,
    cam_pos: jnp.ndarray,
    cfg: RenderConfig,
) -> Dict[str, jnp.ndarray]:
    """SoA fast path: plane projection + appearance straight to the packed
    u32 words consumed by binning.bin_packed_words — bit-identical to
    pack_records(splat_screen_records(...)) without ever materializing the
    (N, 10) record array (the interleaving stack + column re-slices cost
    ~2 ms/frame at 1M splats on v5e — the CLAUDE.md relayout rule).

    Returns {"dk", "w_pos", "w_ro", "w_rgb", "depth"}.
    """
    from .packing import depth_bits

    c = screen_planes(splats, view_proj, cam_pos, cfg)
    return {
        "dk": depth_bits(c["depth"]),
        "w_pos": c["cx_fx"] | (c["cy_fx"] << 16),
        "w_ro": c["r_fx"] | (c["ang8"] << 16) | (c["ratio8"] << 24),
        "w_rgb": c["r8"] | (c["g8"] << 8) | (c["b8"] << 16) | (c["op8"] << 24),
        "depth": c["depth"],
    }


def splat_screen_records(
    splats: Splats,
    view_proj: jnp.ndarray,
    cam_pos: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """The (N, 10) render record for the oracle/XLA-tiles compositors:
    [cx, cy, radius, opacity, r*, g*, b*, depth, angle, ratio] with the
    lambert lighting term pre-folded into rgb, snapped onto the pipeline's
    fixed-point raster grids (render/packing.py) — every compositor consumes
    the same quantized values (from the same screen_planes pass as the words
    path), so oracle parity is exact.  The (N, 10) stack is a relayout the
    Pallas path never pays; this builder is for the readable/oracle paths.
    """
    from .packing import INV_ANGLE_SCALE, INV_COLOR_SCALE, INV_RATIO_SCALE

    c = screen_planes(splats, view_proj, cam_pos, cfg)
    inv_ps, po = 1.0 / cfg.pos_scale, cfg.pos_offset
    f = lambda v: v.astype(jnp.float32)
    # dequant by MULTIPLY only — packing.py INV_* rationale (divide ulps
    # differ between backends and flip hard-cutoff pixels)
    return jnp.stack(
        [
            f(c["cx_fx"]) * inv_ps - po,
            f(c["cy_fx"]) * inv_ps - po,
            f(c["r_fx"]) * inv_ps,
            f(c["op8"]) * INV_COLOR_SCALE,
            f(c["r8"]) * INV_COLOR_SCALE,
            f(c["g8"]) * INV_COLOR_SCALE,
            f(c["b8"]) * INV_COLOR_SCALE,
            c["depth"],
            f(c["ang8"]) * INV_ANGLE_SCALE - _math.pi,
            f(c["ratio8"]) * INV_RATIO_SCALE,
        ],
        axis=-1,
    )
