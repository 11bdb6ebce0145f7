"""Differentiable rendering: gradients from pixels back through the pipeline.

A capability the WebGPU reference structurally cannot offer: its pipeline is
forward-only WGSL (src/ComputeShaderRenderer.ts, src/SplatProjector.ts) with
no autodiff anywhere.  Here every stage is a JAX program, so `jax.grad`
flows from an image loss back to splat positions / radii / colors /
opacities — and, composed with points/* (seeding, Newton projection,
curvature are all jax), to the SDF scene parameters themselves: inverse
modeling ("what sphere radius makes the render match this photo?") is one
`jax.grad` away.

The one non-differentiable pipeline stage is the fixed-point quantization
(render/packing.py grids — `round`/int casts have zero gradient), which is
deliberate pipeline *semantics* for the exact paths.  The diff path therefore
renders from the CONTINUOUS screen record (projector.shade_planes): the same
projection, lighting, ellipse, and blend math, minus the grid snap.  Forward
images differ from the exact pipeline only by quantization step (<= 1/32 px
positions, 1/255 color), test-bounded.

Discrete structure (depth-sort permutation, tile assignment, the hard
support cutoff) follows the standard differentiable-rasterization treatment
(3DGS: Kerbl et al. 2023): the structure is taken from the forward values
and gradients flow through the continuous factors — exact almost everywhere,
zero across the reordering/cutoff boundaries themselves.

Three scales:
- method="oracle": O(N x pixels) dense blend — every splat against every
  pixel; the reference gradient for small fits.
- method="tiles":  the real tile pipeline (canonical sort -> binning ->
  per-tile scan compositor).  Binning indices are ints (no gradient needed);
  the compositor's gathers/scatter-accumulates are differentiable, so this
  scales fitting to the same splat counts the forward path renders.
- method="pallas": the training-grade path — a custom-VJP Pallas kernel pair
  (ops/tile_blend_diff.py) streams the same tile-sorted pair layout as the
  exact renderer's kernel, forward AND backward (the 3DGS blend adjoint
  re-derived as a forward-order suffix-from-total pass).  Isotropic
  profiles only; ~order-of-magnitude faster fit steps than "tiles".
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..points.properties import Splats
from .binning import bin_splats, canonical_sort_data
from .compositor import render_tiles
from .oracle import render_oracle
from .projector import shade_planes

CameraArrays = Dict[str, jnp.ndarray]


def splat_screen_records_diff(
    splats: Splats,
    view_proj: jnp.ndarray,  # (4, 4)
    cam_pos: jnp.ndarray,  # (3,)
    cfg: RenderConfig,
) -> jnp.ndarray:
    """The (N, 10) render record built from CONTINUOUS values — the
    differentiable counterpart of projector.splat_screen_records.

    Same field layout ([cx, cy, radius, opacity, rgb, depth, angle, ratio],
    blend.DATA_DIM), same clamping semantics as the quantizers (colors and
    opacity clipped to [0, 1]), no grid snap.  Every compositor consumes
    records, so the diff record drops into render_oracle / render_tiles
    unchanged.
    """
    c = shade_planes(splats, view_proj, cam_pos, cfg)
    clip01 = lambda v: jnp.clip(v, 0.0, 1.0)  # noqa: E731
    return jnp.stack(
        [
            c["cx"],
            c["cy"],
            c["radius"],
            clip01(c["opacity"]),
            clip01(c["r"]),
            clip01(c["g"]),
            clip01(c["b"]),
            c["depth"],
            c["angle"],
            c["ratio"],
        ],
        axis=-1,
    )


def render_diff(
    splats: Splats,
    camera: CameraArrays,
    cfg: RenderConfig,
    method: str = "oracle",
    block: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Differentiable splat render -> (H, W, 3) image.

    method="oracle" blends all N splats against all pixels (exact dense
    gradient, O(N*HW)); method="tiles" runs the tile pipeline (sort + bin +
    per-tile scan), whose gradient is identical inside each splat's support
    (the binner's footprint covers exactly the support the compositor
    evaluates) and scales to large N.

    Under `jax.grad`, nonzero cotangents reach splats["px"/"py"/"pz"/
    "radius"/"cr"/"cg"/"cb"/"opacity"/"nx"/"ny"/"nz"] (normals contribute
    through the lighting term and the oriented-ellipse shape).
    """
    if method == "pallas":
        if cfg.opaque:
            raise ValueError(
                "render_diff(method='pallas'): the opaque hard-coverage "
                "profile has zero gradient almost everywhere — use the "
                "gaussian profiles (isotropic or oriented)"
            )
        from ..ops.tile_blend_diff import blend_planes_pallas
        from .compositor import tiles_to_image
        from .pipeline import on_tpu

        if interpret is None:
            interpret = not on_tpu()  # Mosaic needs hardware; CPU interprets

        c = shade_planes(splats, camera["view_proj"], camera["cam_pos"], cfg)
        clip01 = lambda v: jnp.clip(v, 0.0, 1.0)  # noqa: E731
        tile_color, tile_alpha, _ = blend_planes_pallas(
            cfg, block, interpret,
            c["cx"], c["cy"], c["radius"], clip01(c["opacity"]),
            clip01(c["r"]), clip01(c["g"]), clip01(c["b"]),
            c["angle"], c["ratio"], c["depth"],
        )
        return tiles_to_image(tile_color, tile_alpha, cfg)

    records = splat_screen_records_diff(
        splats, camera["view_proj"], camera["cam_pos"], cfg
    )
    if method == "oracle":
        return render_oracle(records, cfg)
    if method == "tiles":
        data = canonical_sort_data(records, cfg)
        # binning consumes forward values only: tile ids / run offsets are
        # integers, the standard stop-gradient structure of differentiable
        # rasterizers.  (stop_gradient also keeps the int-cast zero-cotangent
        # paths out of the backward program entirely.)
        binned = bin_splats(jax.lax.stop_gradient(data), cfg)
        return render_tiles(data, binned, cfg, differentiable=True)
    raise ValueError(
        f"unknown method {method!r} (use 'oracle', 'tiles' or 'pallas')"
    )


def render_diff_gbuffer(
    splats: Splats,
    camera: CameraArrays,
    cfg: RenderConfig,
    alpha_eps: float = 1e-6,
    method: str = "tiles",
    block: int = 1024,
    interpret: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """Differentiable G-buffer: {"rgb" (H,W,3), "depth" (H,W), "alpha"
    (H,W)} from the CONTINUOUS record — pipeline.render_gbuffer's diff twin
    (same alpha-normalized expected-depth semantics).

    method="pallas" (training grade): the custom-VJP kernel pair
    (ops/tile_blend_diff.py) accumulates the alpha-weighted expected-depth
    sum as a 4th premultiplied channel under the SAME blend weights as
    color, forward and adjoint — depth-supervised fitting runs at the same
    speed class as color-only fitting.  Isotropic gaussian profiles only
    (like render_diff's pallas method).  method="tiles": the XLA scan
    compositor with `differentiable=True` + `return_aux=True` (any
    profile; ~8-10x slower).

    `jax.grad` of a loss over any channel reaches every continuous splat
    field: the depth channel depends on positions BOTH through the per-pair
    camera distance and through the over-blend weights, so depth supervision
    (fit.fit_splats depth_targets) moves splats along the viewing ray —
    the direction a color-only loss constrains weakly.  Background pixels
    carry depth 0 and alpha ~ 0; mask depth losses by the TARGET's coverage
    so their zero-gradient plateau never contributes.
    """
    if method == "pallas":
        if cfg.opaque:
            raise ValueError("render_diff_gbuffer(method='pallas'): "
                             "gaussian profiles only")
        from ..ops.tile_blend_diff import blend_planes_pallas
        from .compositor import tiles_to_image, tiles_to_plane
        from .pipeline import on_tpu

        if interpret is None:
            interpret = not on_tpu()
        c = shade_planes(splats, camera["view_proj"], camera["cam_pos"], cfg)
        clip01 = lambda v: jnp.clip(v, 0.0, 1.0)  # noqa: E731
        tile_color, tile_alpha, tile_depth = blend_planes_pallas(
            cfg, block, interpret,
            c["cx"], c["cy"], c["radius"], clip01(c["opacity"]),
            clip01(c["r"]), clip01(c["g"]), clip01(c["b"]),
            c["angle"], c["ratio"], c["depth"],
        )
        img = tiles_to_image(tile_color, tile_alpha, cfg)
        alpha = tiles_to_plane(tile_alpha, cfg)
        depth_acc = tiles_to_plane(tile_depth, cfg)
        depth = jnp.where(
            alpha > alpha_eps, depth_acc / jnp.maximum(alpha, alpha_eps), 0.0
        )
        return {"rgb": img, "depth": depth, "alpha": alpha}

    records = splat_screen_records_diff(
        splats, camera["view_proj"], camera["cam_pos"], cfg
    )
    data = canonical_sort_data(records, cfg)
    binned = bin_splats(jax.lax.stop_gradient(data), cfg)
    img, depth_acc, alpha = render_tiles(
        data, binned, cfg, differentiable=True, return_aux=True
    )
    depth = jnp.where(
        alpha > alpha_eps, depth_acc / jnp.maximum(alpha, alpha_eps), 0.0
    )
    return {"rgb": img, "depth": depth, "alpha": alpha}
