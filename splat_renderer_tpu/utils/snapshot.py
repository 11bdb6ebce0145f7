"""Splat-state snapshots (.npz) — the engine's checkpoint/resume story.

The reference persists nothing (all state regenerated per frame, SURVEY.md
section 5 "Checkpoint/resume: none"); for a production datagen engine we add
the dev-convenience snapshot SURVEY.md section 5 recommends: dump/restore the
modeled splat set so expensive modeling runs can be re-rendered from new
cameras without re-modeling.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..points.properties import Splats

_FIELDS = ("position", "radius", "color", "opacity", "normal")


def save_splats(path: str, splats: Splats) -> None:
    np.savez_compressed(path, **{k: np.asarray(splats[k]) for k in _FIELDS})


def load_splats(path: str) -> Splats:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in _FIELDS}
