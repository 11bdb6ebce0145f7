"""Sequential compositing oracle: exact, O(N x pixels), for fidelity testing.

Counterpart of src/SequentialRenderer.ts — "Guarantees perfect back-to-front
ordering but slower" (:1-4), one draw call per splat in sorted order
(:269-307).  Ours blends every splat against every pixel in strict
front-to-back depth order via a chunked lax.scan carrying per-pixel
(color, transmittance); within a chunk the associative over-operator is
applied with an exclusive cumulative product (exact — no approximation).

This is the pixel-level ground truth the tile pipeline must match within fp32
tolerance (BASELINE.json fidelity gate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .blend import (
    composite_over_background,
    segmented_exclusive_product,
    splat_alpha_planes,
)
from .binning import canonical_sort_data


def pixel_grid(cfg: RenderConfig) -> jnp.ndarray:
    """(H*W, 2) pixel-center coordinates (+0.5 like
    src/ComputeShaderRenderer.ts:169)."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (cfg.height, cfg.width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (cfg.height, cfg.width), 1)
    return jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(-1, 2)


def render_oracle(
    splat_data: jnp.ndarray,  # (N, 10) packed screen data, ANY order
    cfg: RenderConfig,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Render the exact image (H, W, 3), blending all N splats front-to-back
    against every pixel."""
    chunk = chunk or cfg.blend_chunk
    # canonical compositing order: (depth_bits, packed-record) lexicographic
    # — shared with the tile paths so bit-equal depth ties agree exactly
    data = canonical_sort_data(splat_data, cfg)

    n = data.shape[0]
    pad = (-n) % chunk
    if pad:
        # padded splats get radius 0 -> zero alpha everywhere
        data = jnp.concatenate([data, jnp.zeros((pad, data.shape[1]), data.dtype)])
    n_chunks = data.shape[0] // chunk
    chunks = data.reshape(n_chunks, chunk, -1)

    # pixel-center PLANES: a (HW, 2) pixel array (and the (chunk, 10)
    # record broadcast) lane-pads its trailing dim toward 128 on TPU —
    # the (chunk, HW, 2) intermediate alone was ~1 GB of traffic per scan
    # step; per-field planes keep every op full-lane
    ys = jax.lax.broadcasted_iota(jnp.float32, (cfg.height, cfg.width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (cfg.height, cfg.width), 1)
    px = (xs + 0.5).reshape(-1)  # (HW,)
    py = (ys + 0.5).reshape(-1)
    hw = px.shape[0]

    def body(carry, chunk_data):
        color, trans = carry  # (3, HW) channel PLANES, (HW,)
        # (chunk, HW) alpha from per-field planes
        a = splat_alpha_planes(
            chunk_data[:, 0:1], chunk_data[:, 1:2], chunk_data[:, 2:3],
            chunk_data[:, 3:4], chunk_data[:, 8:9], chunk_data[:, 9:10],
            px[None, :], py[None, :], cfg,
        )
        starts = jnp.zeros((chunk,), bool).at[0].set(True)
        # exclusive within-chunk transmittance (exact associative scan)
        t_local = segmented_exclusive_product(1.0 - a, starts)  # (chunk, HW)
        weight = a * t_local * trans[None, :]  # (chunk, HW)
        rgb = chunk_data[:, 4:7]  # (chunk, 3)
        # accumulate into (3, HW) channel planes ((HW, 3) would lane-pad
        # 3->128).  NOTE the oracle is COMPUTE-bound regardless: N*HW alpha
        # evaluations = ~26 GFLOP at 10k@256^2 ~= 50 ms at the VPU peak —
        # that O(N * pixels) cost is the definition of the oracle.
        color = color + jnp.einsum(
            "cp,cd->dp", weight, rgb, precision=jax.lax.Precision.HIGHEST
        )
        trans = trans * jnp.prod(1.0 - a, axis=0)
        return (color, trans), None

    init = (jnp.zeros((3, hw), jnp.float32), jnp.ones((hw,), jnp.float32))
    (color, trans), _ = jax.lax.scan(body, init, chunks)
    alpha = 1.0 - trans
    img = composite_over_background(color.T, alpha, cfg)
    return img.reshape(cfg.height, cfg.width, 3)
