"""Offline viewer: render an orbiting turntable sequence to PNG files.

The reference's app layer is a browser canvas + requestAnimationFrame loop
(src/main.ts:107-193, index.html); headless TPU's equivalent is a frame
function plus an image sink (SURVEY.md section 7 "Interactivity without a
canvas").  This drives Engine across an orbit and writes a PNG sequence —
double-buffered so the device renders frame i+1 while frame i transfers.
"""

from __future__ import annotations

import math
import os
from typing import Callable, List, Optional

import jax
import numpy as np

from ..camera import Camera
from ..render.pipeline import Engine
from ..utils.image import write_png


def render_turntable(
    engine: Engine,
    out_dir: str,
    n_frames: int = 60,
    distance: float = 3.0,
    elevation: float = 0.5,
    animate: Optional[Callable[[float], None]] = None,
    seed: int = 0,
) -> List[str]:
    """Render n_frames around a full orbit; returns the written paths.

    `animate(t)` is called before each frame with t = frame index / fps —
    mutate scene primitives there (the reference's per-frame param animation,
    src/main.ts:113-116).
    """
    os.makedirs(out_dir, exist_ok=True)
    cam = Camera(
        distance=distance,
        elevation=elevation,
        aspect=engine.rcfg.width / engine.rcfg.height,
    )
    paths = []
    pending = None  # (path, device_image): overlap render & host transfer
    import jax.numpy as jnp

    for i in range(n_frames):
        t = i / 30.0
        if animate is not None:
            animate(t)
        cam.azimuth = 2.0 * math.pi * i / n_frames
        camera = {k: jnp.asarray(v) for k, v in cam.arrays(t).items()}
        img = engine.frame(camera, jax.random.PRNGKey(seed + i))
        if pending is not None:
            write_png(pending[0], np.asarray(pending[1]))
        pending = (os.path.join(out_dir, f"frame_{i:04d}.png"), img)
        paths.append(pending[0])
    if pending is not None:
        write_png(pending[0], np.asarray(pending[1]))
    return paths
