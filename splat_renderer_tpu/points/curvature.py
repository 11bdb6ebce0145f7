"""Curvature probe: per-point surface normal + curvature-adaptive scale.

Counterpart of src/CurvatureSampler.ts:87-137: sample the SDF normal at six
axial offsets around each settled point, measure average angular variation,
and map it to a splat scale (flat -> 1.0, edge -> 0.01).

Emits the canonical `(normal.xyz, scale)` record that the splat pipeline
consumes — resolving the reference's format drift where CurvatureSampler emits
bare f32 scales but every splat consumer expects vec4 (SURVEY.md section 2.4
item 1).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import PointConfig
from ..sdf.scene import Params, SDFScene

_EPS = 1e-8


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def _smoothstep(e0: float, e1: float, x: jnp.ndarray) -> jnp.ndarray:
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def curvature_probe(
    scene: SDFScene,
    params: Params,
    pts: jnp.ndarray,
    cfg: PointConfig = PointConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (normals (N, 3), scales (N,)).

    7 scene-SDF evaluations per point like the reference (center + 6 taps,
    src/CurvatureSampler.ts:111-125), but evaluated as one (7N, 3) batch so
    XLA vectorizes across taps and points together.
    """
    r = cfg.probe_radius
    offsets = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [r, 0.0, 0.0],
            [-r, 0.0, 0.0],
            [0.0, r, 0.0],
            [0.0, -r, 0.0],
            [0.0, 0.0, r],
            [0.0, 0.0, -r],
        ],
        dtype=pts.dtype,
    )  # (7, 3)
    probe = pts[None, :, :] + offsets[:, None, :]  # (7, N, 3)
    _, grads = scene.sdf(probe, params)  # (7, N, 3)
    normals = _normalize(grads)
    center_n = normals[0]  # (N, 3)
    # angular difference = 1 - dot (src/CurvatureSampler.ts:122-124)
    variation = 1.0 - jnp.sum(normals[1:] * center_n[None], axis=-1)  # (6, N)
    avg_variation = jnp.mean(variation, axis=0)
    # flat -> 1, edgy -> 0 (src/CurvatureSampler.ts:130-134)
    flatness = 1.0 - _smoothstep(0.0, cfg.curvature_range, avg_variation)
    scale = cfg.curvature_min_scale + (1.0 - cfg.curvature_min_scale) * flatness
    return center_n, scale
