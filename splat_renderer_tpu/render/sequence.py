"""Fused frame sequences: a whole animation as ONE XLA program.

BASELINE config 4 ("500k splats animated over 120 frames") has two honest
readings:
  - the interactive loop: one host dispatch per frame (bench.py's
    `animated_120f_s`) — dominated by relay round trips (~85 ms/frame of
    host overhead measured on the axon transport);
  - the datagen loop: all frames inside one `lax.scan`, zero host
    involvement — the TPU-idiomatic form (the reference, being a browser
    app, has no equivalent; its loop is requestAnimationFrame,
    src/main.ts:110-193).

`render_sequence` is the scan form.  Per-frame scene parameters arrive as a
stacked pytree (animate on host, stack once); cameras as stacked arrays
(camera.orbit_ring or any (F, ...) stack).  Output is (F, H, W*3) uint8 by
default — flat interleaved raster rows, because a trailing dim of 3 is
lane-padded 3->128 on TPU (a (120, 1080, 1920, 3) u8 output would allocate
31.8 GB and OOM the chip — measured).  utils.image.unflatten_rows restores
(..., H, W, 3) on host; 120 frames at 1080p is 711 MB on-device, fetched
once.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PointConfig, RenderConfig
from ..sdf.scene import Params, SDFScene
from .pipeline import CameraArrays, model_points, render_splats


def render_sequence(
    scene: SDFScene,
    params_stack: Params,  # pytree, leaves with leading frame axis F
    cameras: CameraArrays,  # leaves with leading frame axis F
    key: jax.Array,
    n: int,
    pcfg: PointConfig,
    rcfg: RenderConfig,
    compositor: str = "auto",
    blend_max_blocks: Optional[int] = None,
    as_uint8: bool = True,
    flat: bool = True,
) -> jnp.ndarray:
    """Render F animated frames in one program; returns (F, H, W*3) when
    `flat` (the TPU-friendly layout — see module docstring), else
    (F, H, W, 3).

    Each frame re-models the scene (seed -> descent -> curvature) with its
    own parameters and a frame-folded PRNG key, then renders — exactly the
    reference's per-frame loop, minus the per-frame host round trip.
    """
    n_frames = jax.tree.leaves(cameras)[0].shape[0]
    frame_ids = jnp.arange(n_frames)

    def step(carry, inputs):
        params, camera, i = inputs
        k = jax.random.fold_in(key, i)
        splats = model_points(scene, params, k, n, pcfg, rcfg)
        img = render_splats(
            splats, camera, rcfg, compositor,
            blend_max_blocks=blend_max_blocks,
        )
        if as_uint8:
            img = jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        if flat:
            img = img.reshape(rcfg.height, rcfg.width * 3)
        return carry, img

    _, imgs = jax.lax.scan(step, None, (params_stack, cameras, frame_ids))
    return imgs
