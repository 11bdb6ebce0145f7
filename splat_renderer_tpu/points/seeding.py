"""Surface-point seeding on the scene's bounding box.

Counterpart of src/PointManager.ts.  The reference regenerates all points in a
per-frame CPU loop and uploads them (src/PointManager.ts:97-187,220-231 — the
live path's CPU hot spot, SURVEY.md section 3.2).  Here seeding runs on-device
with `jax.random`, inside the same jitted program as the descent loop, so the
host never touches point data.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import PointConfig
from ..sdf.scene import Params, SDFScene


def point_count(scene: SDFScene, cfg: PointConfig = PointConfig()) -> int:
    """Dynamic point budget: 30k x sqrt(surface area) per primitive, clamped
    (src/PointManager.ts:22-39).  Uses construction-time parameter values —
    this is a static (shape-determining) quantity."""
    prims = scene.primitives()
    if not prims:
        return 50_000
    total = sum(
        int(cfg.points_per_primitive * (p.surface_area() ** 0.5)) for p in prims
    )
    return max(cfg.min_points, min(total, cfg.max_points))


def seed_points(
    key: jax.Array,
    aabb_lo: jnp.ndarray,
    aabb_hi: jnp.ndarray,
    n: int,
) -> jnp.ndarray:
    """Sample n points on the AABB surface, face chosen proportionally to face
    area (src/PointManager.ts:116-178).  Returns (n, 3) float32.

    The two uniform in-face coordinates are drawn for all six face choices at
    once and the face select is a gather — branch-free, TPU-vectorized.
    """
    d = aabb_hi - aabb_lo  # (3,)
    dx, dy, dz = d[0], d[1], d[2]
    # face order matches the reference: -X +X -Y +Y -Z +Z
    face_areas = jnp.stack([dy * dz, dy * dz, dx * dz, dx * dz, dx * dy, dx * dy])
    k_face, k_uv = jax.random.split(key)
    # area-proportional face choice by CDF inversion (5 vector compares —
    # cheaper than categorical's gumbel log/argmax, same distribution)
    cdf = jnp.cumsum(face_areas) / jnp.sum(face_areas)  # (6,)
    uf = jax.random.uniform(k_face, (n,), dtype=jnp.float32)
    face = jnp.zeros((n,), jnp.int32)
    for kf in range(5):
        face = face + (uf > cdf[kf]).astype(jnp.int32)
    uv = jax.random.uniform(k_uv, (n, 2), dtype=jnp.float32)  # in-face coords

    # branchless face -> unit-box coordinates (a take_along_axis gather here
    # costs ~8 cycles/element on the TPU scalar core; selects are free)
    u, v = uv[:, 0], uv[:, 1]
    axis = face >> 1  # 0: x-faces, 1: y-faces, 2: z-faces
    hi = (face & 1).astype(jnp.float32)
    unit_x = jnp.where(axis == 0, hi, u)
    unit_y = jnp.where(axis == 1, hi, jnp.where(axis == 0, u, v))
    unit_z = jnp.where(axis == 2, hi, v)
    unit = jnp.stack([unit_x, unit_y, unit_z], axis=-1)  # (n, 3)
    return aabb_lo + unit * d


def seed_scene_points(
    key: jax.Array,
    scene: SDFScene,
    params: Params,
    n: int,
    cfg: PointConfig = PointConfig(),
) -> jnp.ndarray:
    """Seed on the scene's global AABB grown by cfg.aabb_scale
    (src/PointManager.ts:101-103,212-213)."""
    lo, hi = scene.seeding_aabb(params, cfg.aabb_scale)
    return seed_points(key, lo, hi, n)
