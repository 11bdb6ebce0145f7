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
    face = jax.random.categorical(
        k_face, jnp.log(jnp.maximum(face_areas, 1e-20)), shape=(n,)
    )  # (n,) int32
    uv = jax.random.uniform(k_uv, (n, 2), dtype=jnp.float32)  # in-face coords

    u, v = uv[:, 0], uv[:, 1]
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    # Per-face (x, y, z) in unit-box coordinates; one row per face choice.
    face_coords = jnp.stack(
        [
            jnp.stack([zeros, u, v], axis=-1),  # -X
            jnp.stack([ones, u, v], axis=-1),  # +X
            jnp.stack([u, zeros, v], axis=-1),  # -Y
            jnp.stack([u, ones, v], axis=-1),  # +Y
            jnp.stack([u, v, zeros], axis=-1),  # -Z
            jnp.stack([u, v, ones], axis=-1),  # +Z
        ],
        axis=0,
    )  # (6, n, 3)
    unit = jnp.take_along_axis(face_coords, face[None, :, None], axis=0)[0]  # (n, 3)
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
