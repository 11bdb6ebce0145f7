"""Splat property derivation: positions + curvature -> renderable splats.

Counterpart of src/SplatPropertyManager.ts:82-107, which packs an interleaved
32-byte [vec4(pos, radius), vec4(color, opacity)] record per splat.  On TPU we
keep a structure-of-arrays pytree instead — interleaving is a GPU
cache-layout trick; XLA wants contiguous per-field arrays.

Divergence (intentional, SURVEY.md section 2.4 item 4): the reference
hardcodes radius 0.04 with a "TEMPORARY" comment, ignoring the curvature
scale; we apply `base_radius * scale` so curvature actually shrinks splats
near edges, matching the live Renderer's `0.025 * scaleFactor` behavior
(src/Renderer.ts:100-105).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..config import RenderConfig

Splats = Dict[str, jnp.ndarray]


def derive_splats(
    positions: jnp.ndarray,  # (N, 3)
    normals: jnp.ndarray,  # (N, 3)
    scales: jnp.ndarray,  # (N,)
    cfg: RenderConfig = RenderConfig(),
) -> Splats:
    """Build the splat set consumed by projectors/compositors.

    color = |normal| * 0.8 + 0.2 (src/SplatPropertyManager.ts:97-98),
    opacity = cfg.base_opacity (:100-102).
    """
    radius = cfg.base_radius * scales
    if cfg.color_mode == "normal_signed":
        color = normals * 0.5 + 0.5  # live-path coloring, src/Renderer.ts:127-128
    else:
        color = jnp.abs(normals) * 0.8 + 0.2
    opacity = jnp.full(positions.shape[:1], cfg.base_opacity, positions.dtype)
    return {
        "position": positions,
        "radius": radius,
        "color": color,
        "opacity": opacity,
        "normal": normals,
    }


def num_splats(splats: Splats) -> int:
    return splats["position"].shape[0]


def default_splats(positions: jnp.ndarray, cfg: RenderConfig = RenderConfig()) -> Splats:
    """CPU-default splat properties for positions without curvature data:
    radius 0.04, white, opacity 0.7, +y normals
    (src/SplatPropertyManager.ts:33-58)."""
    n = positions.shape[0]
    normals = jnp.zeros((n, 3), positions.dtype).at[:, 1].set(1.0)
    return {
        "position": positions,
        "radius": jnp.full((n,), 0.04, positions.dtype),
        "color": jnp.ones((n, 3), positions.dtype),
        "opacity": jnp.full((n,), 0.7, positions.dtype),
        "normal": normals,
    }
