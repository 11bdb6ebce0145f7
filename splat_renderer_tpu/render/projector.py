"""Splat projection: world space -> screen space, depth, radius, bounds.

Counterpart of src/SplatProjector.ts:34-133 (one WGSL thread per splat); here
each field is computed for the whole (N,) batch with one batched 4x4 matmul —
exactly the shape the MXU/VPU want.

Output is a structure-of-arrays dict instead of the reference's packed
32-byte ProjectedSplat record; the two conflicting layouts noted in SURVEY.md
section 2.4 item 2 collapse into named fields.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..config import RenderConfig

Projected = Dict[str, jnp.ndarray]


def _to_screen(
    world: jnp.ndarray, view_proj: jnp.ndarray, width: int, height: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project (..., 3) world points to (..., 2) pixel coordinates.

    NDC -> screen mapping per src/SplatProjector.ts:85-89 (y flipped).
    Returns (screen_xy, clip_w).
    """
    hom = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    clip = hom @ view_proj.T
    w = clip[..., 3]
    ndc = clip[..., :2] / jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)[..., None]
    sx = (ndc[..., 0] + 1.0) * 0.5 * width
    sy = (1.0 - ndc[..., 1]) * 0.5 * height
    return jnp.stack([sx, sy], axis=-1), w


def project_splats(
    view_proj: jnp.ndarray,  # (4, 4)
    cam_pos: jnp.ndarray,  # (3,)
    positions: jnp.ndarray,  # (N, 3)
    radii: jnp.ndarray,  # (N,)
    cfg: RenderConfig,
) -> Projected:
    """Project all splats; returns dict with:

    - center (N, 2): screen-space splat center
    - depth (N,): camera-space distance (src/SplatProjector.ts:77)
    - radius (N,): max screen-space radius over 6 axial offsets (:91-113)
    - bounds_min / bounds_max (N, 2): center +- margin*radius (:115-121)
    - valid (N,): in front of the camera.  The reference never culls; without
      a near-plane test a splat behind the eye would projectively wrap.  We
      mark it invalid (divergence documented; invalid splats get depth=inf and
      are dropped by binning).
    """
    hom = jnp.concatenate([positions, jnp.ones_like(positions[..., :1])], axis=-1)
    clip = hom @ view_proj.T  # (N, 4)
    w_center = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w_center) < 1e-8, 1e-8, w_center)
    half = jnp.array([0.5 * cfg.width, 0.5 * cfg.height], positions.dtype)
    ndc = clip[:, :2] / safe_w[:, None]
    center = jnp.stack(
        [(ndc[:, 0] + 1.0) * half[0], (1.0 - ndc[:, 1]) * half[1]], axis=-1
    )
    depth = jnp.linalg.norm(positions - cam_pos, axis=-1)

    # 6 axial offsets (+-r along each world axis): their clip coordinates are
    # clip_center +- r * VP_column, so no extra matmuls or an (N, 6, 3)
    # probe batch are needed — same max-over-6 semantics as
    # src/SplatProjector.ts:91-113 at a sixth of the cost
    screen_radius = jnp.zeros_like(depth)
    valid = w_center > 1e-6
    for axis in range(3):
        col = view_proj[:, axis]  # clip-space delta per unit world axis step
        for sign in (1.0, -1.0):
            c = clip + (sign * radii)[:, None] * col[None, :]
            wp = c[:, 3]
            valid = valid & (wp > 1e-6)
            safe_wp = jnp.where(jnp.abs(wp) < 1e-8, 1e-8, wp)
            nx = c[:, 0] / safe_wp
            ny = c[:, 1] / safe_wp
            sx = (nx + 1.0) * half[0]
            sy = (1.0 - ny) * half[1]
            d = jnp.sqrt((sx - center[:, 0]) ** 2 + (sy - center[:, 1]) ** 2)
            screen_radius = jnp.maximum(screen_radius, d)
    # Cap the screen radius so the padded bounds box always fits inside
    # tiles_per_splat_cap tiles: bbox side 2*margin*r spans at most
    # floor(sqrt(cap)) tiles when r <= (k-1)*tile_size / (2*margin).
    # Without this, over-cap footprints would have tiles silently dropped by
    # the binner — an oracle-invisible divergence; clamping the radius in the
    # record itself keeps every compositor (oracle included) consistent.
    # (The reference has the same pathology class and merely warns,
    # src/GPUTileBinner.ts:265-281.)
    k = max(int(cfg.tiles_per_splat_cap**0.5), 2)
    r_max = (k - 1) * cfg.tile_size / (2.0 * cfg.bounds_margin)
    radius_raw = jnp.where(valid, screen_radius, 0.0)  # pre-clamp, for stats
    screen_radius = jnp.minimum(screen_radius, r_max)
    screen_radius = jnp.where(valid, screen_radius, 0.0)
    depth = jnp.where(valid, depth, jnp.inf)

    padded = screen_radius * cfg.bounds_margin
    return {
        "center": center,
        "depth": depth,
        "radius": screen_radius,
        "radius_raw": radius_raw,
        "bounds_min": center - padded[:, None],
        "bounds_max": center + padded[:, None],
        "valid": valid,
    }


def _screen_columns(
    projected: Projected,
    color: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    normals: jnp.ndarray,  # (N, 3)
    cfg: RenderConfig,
    view_proj: jnp.ndarray | None = None,  # (4, 4), required if cfg.oriented
    cam_pos: jnp.ndarray | None = None,  # (3,)
    positions: jnp.ndarray | None = None,  # (N, 3) world positions
    radii: jnp.ndarray | None = None,  # (N,) world radii
) -> Dict[str, jnp.ndarray]:
    """Appearance + fixed-point quantization, structure-of-arrays.

    Returns the integer grid columns of the render record (render/packing.py
    grids): cx_fx/cy_fx/r_fx (u32, 1/pos_scale px), op8/r8/g8/b8/ang8/ratio8
    (u32, u8 grids) plus depth (f32).  Shared by the (N, 10) record builder
    and the packed-words fast path; both therefore quantize identically.

    Lighting: litColor = color * (ambient + diffuse * max(dot(n, L), 0))
    (src/ComputeShaderRenderer.ts:143-145) depends only on per-splat normals,
    so it moves out of the per-pixel loop entirely — the reference recomputes
    it per (pixel, splat) pair.
    """
    import math as _math

    from .packing import ANGLE_SCALE, COLOR_SCALE, POS_MAX, RATIO_SCALE

    light = jnp.asarray(cfg.light_dir, dtype=color.dtype)
    light = light / jnp.linalg.norm(light)
    diffuse = jnp.maximum(jnp.sum(normals * light, axis=-1), 0.0)
    lit = color * (cfg.light_ambient + cfg.light_diffuse * diffuse)[:, None]

    n = normals.shape[0]
    if cfg.oriented:
        # screen ellipse of a surface-oriented disc: minor axis along the
        # screen projection of the normal, minor/major = |n . view| —
        # a small-splat approximation of the reference's tangent-frame quads
        # (src/Renderer.ts:90-117), which foreshorten the same way
        if view_proj is None or positions is None:
            raise ValueError("oriented splats need view_proj/cam_pos/positions")
        view_dir = positions - cam_pos
        view_dir = view_dir / jnp.maximum(
            jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8
        )
        cos_view = jnp.sum(normals * view_dir, axis=-1)
        tip = positions + (radii[:, None] if radii is not None else 0.01) * normals
        tip_screen, _ = _to_screen(tip, view_proj, cfg.width, cfg.height)
        n_screen = tip_screen - projected["center"]
        angle = jnp.arctan2(n_screen[:, 1], n_screen[:, 0])
        ratio = jnp.clip(jnp.abs(cos_view), 0.05, 1.0)
    else:
        angle = jnp.zeros((n,), color.dtype)
        ratio = jnp.ones((n,), color.dtype)

    ps, po = cfg.pos_scale, cfg.pos_offset
    center = projected["center"]
    q = lambda v: jnp.round(jnp.clip((v + po) * ps, 0, POS_MAX)).astype(jnp.uint32)
    return {
        "cx_fx": q(center[:, 0]),
        "cy_fx": q(center[:, 1]),
        "r_fx": jnp.round(jnp.clip(projected["radius"] * ps, 0, POS_MAX)).astype(
            jnp.uint32
        ),
        "op8": jnp.round(jnp.clip(opacity, 0.0, 1.0) * COLOR_SCALE).astype(
            jnp.uint32
        ),
        "rgb8": jnp.round(jnp.clip(lit, 0.0, 1.0) * COLOR_SCALE).astype(jnp.uint32),
        "ang8": (
            jnp.round((angle + _math.pi) * ANGLE_SCALE).astype(jnp.int32) % 256
        ).astype(jnp.uint32),
        "ratio8": jnp.round(
            jnp.clip(ratio, 1.0 / RATIO_SCALE, 1.0) * RATIO_SCALE
        ).astype(jnp.uint32),
        "depth": projected["depth"],
    }


def pack_splat_screen_data(
    projected: Projected,
    color: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    normals: jnp.ndarray,  # (N, 3)
    cfg: RenderConfig,
    view_proj: jnp.ndarray | None = None,  # (4, 4), required if cfg.oriented
    cam_pos: jnp.ndarray | None = None,  # (3,)
    positions: jnp.ndarray | None = None,  # (N, 3) world positions
    radii: jnp.ndarray | None = None,  # (N,) world radii
) -> jnp.ndarray:
    """Fuse projection + appearance into the (N, 10) render record consumed by
    the compositors: [cx, cy, radius, opacity, r*, g*, b*, depth, angle,
    ratio] with the lambert lighting term pre-folded into rgb, snapped onto
    the pipeline's fixed-point raster grids (render/packing.py) — every
    compositor consumes the same quantized values, so oracle parity is exact.
    """
    import math as _math

    from .packing import ANGLE_SCALE, COLOR_SCALE, RATIO_SCALE

    c = _screen_columns(
        projected, color, opacity, normals, cfg,
        view_proj=view_proj, cam_pos=cam_pos, positions=positions, radii=radii,
    )
    ps, po = cfg.pos_scale, cfg.pos_offset
    f = lambda v: v.astype(jnp.float32)
    return jnp.stack(
        [
            f(c["cx_fx"]) / ps - po,
            f(c["cy_fx"]) / ps - po,
            f(c["r_fx"]) / ps,
            f(c["op8"]) / COLOR_SCALE,
            f(c["rgb8"][:, 0]) / COLOR_SCALE,
            f(c["rgb8"][:, 1]) / COLOR_SCALE,
            f(c["rgb8"][:, 2]) / COLOR_SCALE,
            c["depth"],
            f(c["ang8"]) / ANGLE_SCALE - _math.pi,
            f(c["ratio8"]) / RATIO_SCALE,
        ],
        axis=-1,
    )


def splat_screen_words(
    projected: Projected,
    color: jnp.ndarray,
    opacity: jnp.ndarray,
    normals: jnp.ndarray,
    cfg: RenderConfig,
    view_proj: jnp.ndarray | None = None,
    cam_pos: jnp.ndarray | None = None,
    positions: jnp.ndarray | None = None,
    radii: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """SoA fast path: projection + appearance straight to the packed u32
    words consumed by binning.bin_packed_words — bit-identical to
    pack_records(pack_splat_screen_data(...)) without ever materializing the
    (N, 10) record array (the interleaving stack + column re-slices cost
    ~2 ms/frame at 1M splats on v5e — the CLAUDE.md relayout rule).

    Returns {"dk", "w_pos", "w_ro", "w_rgb", "depth"}.
    """
    from .packing import depth_bits

    c = _screen_columns(
        projected, color, opacity, normals, cfg,
        view_proj=view_proj, cam_pos=cam_pos, positions=positions, radii=radii,
    )
    return {
        "dk": depth_bits(c["depth"]),
        "w_pos": c["cx_fx"] | (c["cy_fx"] << 16),
        "w_ro": c["r_fx"] | (c["ang8"] << 16) | (c["ratio8"] << 24),
        "w_rgb": c["rgb8"][:, 0]
        | (c["rgb8"][:, 1] << 8)
        | (c["rgb8"][:, 2] << 16)
        | (c["op8"] << 24),
        "depth": c["depth"],
    }
