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


def checkpoint_file(path: str) -> str:
    """The actual on-disk file for a checkpoint path: np.savez appends
    '.npz' to suffix-less names, so existence checks must too."""
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree) -> None:
    """Checkpoint an arbitrary array pytree (optimizer states, fit loops).

    Leaves are keyed by their `jax.tree_util` key path, so any pytree whose
    structure the loader can reproduce (see `load_pytree`) round-trips —
    including optax optimizer states.  No pickling: arrays only.

    The write is ATOMIC (temp file + os.replace): a crash mid-save — the
    exact event checkpoints exist for — can never destroy the previous
    good checkpoint.
    """
    import os

    import jax

    path = checkpoint_file(path)
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp, **{jax.tree_util.keystr(p): np.asarray(v) for p, v in leaves}
    )
    os.replace(tmp, path)


def load_pytree(path: str, like):
    """Load a `save_pytree` archive into the structure of `like`.

    `like` supplies the tree STRUCTURE (and leaf order); its leaf values are
    ignored.  Shapes are whatever was saved — callers resuming a training
    loop get back exactly the arrays they checkpointed.
    """
    import jax

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    with np.load(checkpoint_file(path)) as z:
        leaves = [
            jnp.asarray(z[jax.tree_util.keystr(p)]) for p, _ in paths_leaves
        ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
