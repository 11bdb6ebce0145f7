"""Gradient-descent projection of seed points onto the implicit surface.

Counterpart of the reference's per-frame loop of 5 x (GradientSampler +
PositionUpdater) dispatches with ping-pong buffers and a queue.submit each
iteration (src/main.ts:149-172, src/shaders/update-positions.wgsl:22-50).

TPU-native shape: one `lax.scan` inside one jitted program.  Ping-pong
disappears (functional update), the 5 submits disappear (one XLA program), and
the SDF evaluation fuses with the position update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sdf.scene import Params, SDFScene

_EPS = 1e-4


def project_step(scene: SDFScene, params: Params, pts: jnp.ndarray) -> jnp.ndarray:
    """One Newton-style projection step: p <- p - normalize(grad) * dist.

    Matches update-positions.wgsl:40-46 exactly: the step is the full distance
    (instant projection); points with degenerate gradients stay put.  (The
    shader's unused `stepSize` constant — SURVEY.md section 2.4 item 4 — is
    intentionally not reproduced.)
    """
    dist, grad = scene.sdf(pts, params)
    glen = jnp.linalg.norm(grad, axis=-1)
    step = grad / jnp.maximum(glen, _EPS)[..., None] * dist[..., None]
    return jnp.where((glen > _EPS)[..., None], pts - step, pts)


def project_to_surface(
    scene: SDFScene, params: Params, pts: jnp.ndarray, steps: int = 5
) -> jnp.ndarray:
    """Run `steps` projection iterations (src/main.ts:149-172 runs 5)."""

    def body(p, _):
        return project_step(scene, params, p), None

    out, _ = jax.lax.scan(body, pts, None, length=steps)
    return out
