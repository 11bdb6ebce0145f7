"""Splat-state snapshots (.npz) — the engine's checkpoint/resume story.

The reference persists nothing (all state regenerated per frame, SURVEY.md
section 5 "Checkpoint/resume: none"); for a production datagen engine we add
the dev-convenience snapshot SURVEY.md section 5 recommends: dump/restore the
modeled splat set so expensive modeling runs can be re-rendered from new
cameras without re-modeling.

On disk the splat set is stored as array-of-structs fields (position/color/
normal (N, 3)) — the natural interchange layout; in memory it is the plane
pytree of points/properties.py.  Legacy plane-keyed and AoS-keyed archives
both load.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..points.properties import (
    PLANE_FIELDS,
    Splats,
    splat_colors,
    splat_normals,
    splat_positions,
    splats_from_aos,
)

_AOS_FIELDS = ("position", "radius", "color", "opacity", "normal")


def save_splats(path: str, splats: Splats) -> None:
    np.savez_compressed(
        path,
        position=np.asarray(splat_positions(splats)),
        radius=np.asarray(splats["radius"]),
        color=np.asarray(splat_colors(splats)),
        opacity=np.asarray(splats["opacity"]),
        normal=np.asarray(splat_normals(splats)),
    )


def load_splats(path: str) -> Splats:
    with np.load(path) as z:
        if "position" in z.files:
            return splats_from_aos(
                jnp.asarray(z["position"]),
                jnp.asarray(z["radius"]),
                jnp.asarray(z["color"]),
                jnp.asarray(z["opacity"]),
                jnp.asarray(z["normal"]),
            )
        return {k: jnp.asarray(z[k]) for k in PLANE_FIELDS}
