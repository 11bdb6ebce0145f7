"""Batched multi-view rendering — the datagen front end.

BASELINE.json config 5: "8 OrbitCameraController views per step, 2M splats at
1080p, one fused XLA render program".  The reference has no multi-view
anything; this is the TPU-native batch axis: one splat set rendered from V
cameras inside a single jitted program.

Views are mapped with lax.map (sequential on-device): rendering saturates the
chip per view, so view-level parallelism buys nothing on one chip — it buys
linear scaling across chips (parallel/sharding.render_views_* shard this same
axis over a mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..points.properties import Splats
from .pipeline import CameraArrays, render_splats


def render_views(
    splats: Splats,
    cameras: CameraArrays,  # leaves with leading view axis V
    rcfg: RenderConfig,
    compositor: str = "auto",
    blend_block: int = 1024,
    blend_max_blocks: int | None = None,
    flat: bool = False,
    as_uint8: bool = False,
    sh=None,
) -> jnp.ndarray:
    """Render one splat set from V cameras; returns (V, H, W, 3), or
    (V, H, W*3) with `flat=True` — the TPU-friendly output layout (a
    trailing dim of 3 is lane-padded 3->128 in HBM, a 42x allocation /
    bandwidth tax on big view stacks; utils.image.unflatten_rows restores
    channels on host).  as_uint8 quantizes on device (datagen: 4x less
    host transfer and no host-side conversion).  `sh` (render/sh.py)
    lights each view along its own camera ray inside the fused program —
    view-dependent color is per view by definition."""
    from .sh import apply_sh

    def one(camera: CameraArrays) -> jnp.ndarray:
        s = apply_sh(splats, sh, camera["cam_pos"]) if sh is not None else splats
        img = render_splats(
            s, camera, rcfg, compositor, blend_block,
            blend_max_blocks=blend_max_blocks,
        )
        if as_uint8:
            img = jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        if flat:
            img = img.reshape(rcfg.height, rcfg.width * 3)
        return img

    return jax.lax.map(one, cameras)


def render_views_gbuffer(
    splats: Splats,
    cameras: CameraArrays,  # leaves with leading view axis V
    rcfg: RenderConfig,
    pair_chunk: int = 1024,
    sh=None,
    method: str = "auto",
    blend_max_blocks=None,
):
    """Multi-view G-buffer: {"rgb" (V, H, W, 3), "depth" (V, H, W),
    "alpha" (V, H, W)} in one fused program — render_views's twin over
    render_gbuffer (the datagen channels the reference's color-only
    compositor lacks, src/ComputeShaderRenderer.ts:193-197).  Depth is the
    alpha-normalized expected splat camera distance (0 where nothing was
    hit), alpha the composited coverage; both under the exact same
    over-blend weights as the color, so the three channels are mutually
    consistent per pixel.  `sh` lights each view along its own camera ray
    like render_views.  method/blend_max_blocks route to render_gbuffer's
    kernel path (on TPU the depth-carrying Pallas stream, ~8-10x the scan
    path's speed — bulk RGB-D datagen at kernel rate)."""
    from .pipeline import render_gbuffer
    from .sh import apply_sh

    def one(camera: CameraArrays):
        s = apply_sh(splats, sh, camera["cam_pos"]) if sh is not None else splats
        return render_gbuffer(s, camera, rcfg, pair_chunk, method=method,
                              blend_max_blocks=blend_max_blocks)

    return jax.lax.map(one, cameras)
