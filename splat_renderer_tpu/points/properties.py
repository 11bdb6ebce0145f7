"""Splat property derivation: positions + curvature -> renderable splats.

Counterpart of src/SplatPropertyManager.ts:82-107, which packs an interleaved
32-byte [vec4(pos, radius), vec4(color, opacity)] record per splat.  On TPU we
keep a structure-of-PLANES pytree — one (N,) array per scalar field:

    {"px","py","pz","radius","cr","cg","cb","opacity","nx","ny","nz"}

Interleaving is a GPU cache-layout trick; on TPU even (N, 3) arrays are a
trap: XLA lane-pads the minor dim toward the 128-lane tile, so every read of
a (1M, 3) array moves ~40x the useful bytes and each column slice costs
~1 ms (measured v5e, benchmarks/probe_project.py — 3 column extractions
alone were 3.06 ms, the entire projection stage's budget).  Planes make the
whole projection stage pure full-lane elementwise math.

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

PLANE_FIELDS = ("px", "py", "pz", "radius", "cr", "cg", "cb", "opacity",
                "nx", "ny", "nz")


def derive_splats(
    positions: jnp.ndarray,  # (N, 3)
    normals: jnp.ndarray,  # (N, 3)
    scales: jnp.ndarray,  # (N,)
    cfg: RenderConfig = RenderConfig(),
) -> Splats:
    """Build the splat set consumed by projectors/compositors.

    color = |normal| * 0.8 + 0.2 (src/SplatPropertyManager.ts:97-98),
    opacity = cfg.base_opacity (:100-102).  The (N, 3) -> plane column split
    happens HERE, once per model run, so the per-frame render path never
    touches a lane-padded (N, 3) array.
    """
    radius = cfg.base_radius * scales
    nx, ny, nz = normals[:, 0], normals[:, 1], normals[:, 2]
    if cfg.color_mode == "normal_signed":
        # live-path coloring, src/Renderer.ts:127-128
        color = (nx * 0.5 + 0.5, ny * 0.5 + 0.5, nz * 0.5 + 0.5)
    else:
        color = (jnp.abs(nx) * 0.8 + 0.2, jnp.abs(ny) * 0.8 + 0.2,
                 jnp.abs(nz) * 0.8 + 0.2)
    opacity = jnp.full(radius.shape, cfg.base_opacity, radius.dtype)
    return {
        "px": positions[:, 0],
        "py": positions[:, 1],
        "pz": positions[:, 2],
        "radius": radius,
        "cr": color[0],
        "cg": color[1],
        "cb": color[2],
        "opacity": opacity,
        "nx": nx,
        "ny": ny,
        "nz": nz,
    }


def num_splats(splats: Splats) -> int:
    return splats["px"].shape[0]


def splat_positions(splats: Splats) -> jnp.ndarray:
    """(N, 3) world positions — for host-side consumers (snapshots, tests);
    the hot path never builds this (lane-padded layout, see module doc)."""
    return jnp.stack([splats["px"], splats["py"], splats["pz"]], axis=-1)


def splat_normals(splats: Splats) -> jnp.ndarray:
    return jnp.stack([splats["nx"], splats["ny"], splats["nz"]], axis=-1)


def splat_colors(splats: Splats) -> jnp.ndarray:
    return jnp.stack([splats["cr"], splats["cg"], splats["cb"]], axis=-1)


def splats_from_aos(
    positions: jnp.ndarray,  # (N, 3)
    radius: jnp.ndarray,  # (N,)
    color: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    normals: jnp.ndarray,  # (N, 3)
) -> Splats:
    """Assemble a plane Splats dict from array-of-structs fields (snapshot
    loading, external data)."""
    return {
        "px": positions[:, 0], "py": positions[:, 1], "pz": positions[:, 2],
        "radius": radius,
        "cr": color[:, 0], "cg": color[:, 1], "cb": color[:, 2],
        "opacity": opacity,
        "nx": normals[:, 0], "ny": normals[:, 1], "nz": normals[:, 2],
    }


def default_splats(positions: jnp.ndarray, cfg: RenderConfig = RenderConfig()) -> Splats:
    """CPU-default splat properties for positions without curvature data:
    radius 0.04, white, opacity 0.7, +y normals
    (src/SplatPropertyManager.ts:33-58)."""
    n = positions.shape[0]
    one = jnp.ones((n,), positions.dtype)
    zero = jnp.zeros((n,), positions.dtype)
    return {
        "px": positions[:, 0],
        "py": positions[:, 1],
        "pz": positions[:, 2],
        "radius": jnp.full((n,), 0.04, positions.dtype),
        "cr": one, "cg": one, "cb": one,
        "opacity": jnp.full((n,), 0.7, positions.dtype),
        "nx": zero, "ny": one, "nz": zero,
    }
