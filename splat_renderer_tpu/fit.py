"""Inverse rendering: fit splat fields to target images by gradient descent.

The library API over render/diff.py — a miniature 3DGS-style optimization
loop (Kerbl et al. 2023's appearance/geometry fitting, minus adaptive
density control).  No counterpart exists in the WebGPU reference (its
pipeline is forward-only WGSL); `fit_demo.py` is the CLI showcase.

Design notes (all measured, see CLAUDE.md):
- One jitted step; `splats` and `targets` are jit ARGUMENTS, never closure
  captures — image-sized array constants baked into a large program return a
  wrong scalar loss over the axon relay.
- method="pallas" uses the custom-VJP kernel pair (ops/tile_blend_diff.py),
  the training-speed path; "tiles"/"oracle" are the XLA references.
- Multi-view: the loss averages over the views; each view renders inside the
  same jitted step (unrolled — view counts are small).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .points.properties import Splats
from .render.diff import CameraArrays, render_diff

FIT_FIELDS_APPEARANCE = ("cr", "cg", "cb", "opacity")
FIT_FIELDS_GEOMETRY = ("px", "py", "pz", "radius")


def render_targets(
    splats: Splats,
    cameras: Sequence[CameraArrays],
    cfg: RenderConfig,
    method: str = "pallas",
) -> Tuple[jnp.ndarray, ...]:
    """Render one target image per camera with the diff path (for synthetic
    fitting experiments / tests)."""
    f = jax.jit(lambda s, c: render_diff(s, c, cfg, method=method))
    return tuple(f(splats, cam) for cam in cameras)


def fit_splats(
    splats: Splats,
    cameras: Sequence[CameraArrays],
    targets: Sequence[jnp.ndarray],
    cfg: RenderConfig,
    fields: Sequence[str] = FIT_FIELDS_APPEARANCE,
    steps: int = 100,
    lr: float = 3e-2,
    method: str = "pallas",
    init: Optional[Dict[str, jnp.ndarray]] = None,
    log_every: int = 0,
) -> Tuple[Splats, jnp.ndarray]:
    """Optimize `fields` of `splats` so renders match `targets` (MSE, Adam).

    cameras/targets are parallel sequences (multi-view joint fit).  `init`
    overrides the starting value per field (default: the current values in
    `splats` — pass e.g. gray planes to re-fit appearance from scratch).
    Returns (splats with fitted fields, (steps,) loss curve).
    """
    if len(cameras) != len(targets):
        raise ValueError("cameras and targets must pair up")
    if not fields:
        raise ValueError("nothing to fit: fields is empty")
    import optax

    theta = {k: (init[k] if init and k in init else splats[k]) for k in fields}
    opt = optax.adam(lr)
    opt_state = opt.init(theta)
    targets = tuple(targets)

    @jax.jit
    def step(theta, opt_state, splats, targets):
        def loss_fn(theta):
            s = dict(splats, **theta)
            per_view = [
                jnp.mean((render_diff(s, cam, cfg, method=method) - t) ** 2)
                for cam, t in zip(cameras, targets)
            ]
            return sum(per_view) / len(per_view)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = opt.update(grads, opt_state)
        return loss, optax.apply_updates(theta, updates), opt_state

    losses = []
    for i in range(steps):
        loss, theta, opt_state = step(theta, opt_state, splats, targets)
        losses.append(loss)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"fit step {i:4d}  mse {float(loss):.3e}")
    return dict(splats, **theta), jnp.stack(losses)


def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio of an MSE loss (images in [0, 1])."""
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
