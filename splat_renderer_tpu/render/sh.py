"""View-dependent splat color: real spherical-harmonics appearance.

Pre-trained 3DGS scenes (Kerbl et al. 2023) store per-splat color as real SH
coefficients up to degree 3: a DC term (f_dc) plus 3/8/15 higher-band
coefficients per channel (f_rest), evaluated along the camera->splat
direction each frame.  The WebGPU reference has no SH (its colors come from
SDF normals, /root/reference/src/SplatPropertyManager.ts:82-107); this module
exists so scenes loaded through ``utils/ply.py`` keep their view-dependent
appearance instead of degrading to the DC term.

TPU shape discipline (CLAUDE.md): coefficients live as a ``(n_rest, N)``
row-plane array per channel — each row is a contiguous full-lane (N,) plane,
so the whole evaluation is elementwise FMA chains over planes (no (N, K)
lane padding, no gathers).  At 1M splats / degree 3 the eval is ~150 flops
per splat of pure VPU work, fused by XLA into the projection program.

The basis is the standard real SH used by 3DGS (bands l=0..3 in the usual
y/z/x ordering); constants below are the closed-form normalization values.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..points.properties import Splats

# Real spherical-harmonics normalization constants, bands 0..3.
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

# rest-coefficient count per channel for each supported degree
_REST_PER_DEGREE = {0: 0, 1: 3, 2: 8, 3: 15}

SHCoeffs = Dict[str, jnp.ndarray]  # {"r"|"g"|"b": (n_rest, N) f32}


def sh_degree(sh: Optional[SHCoeffs]) -> int:
    """Infer the SH degree from the coefficient row count (0 for None)."""
    if sh is None:
        return 0
    rows = int(sh["r"].shape[0])
    for deg, n in _REST_PER_DEGREE.items():
        if n == rows:
            return deg
    raise ValueError(
        f"sh coefficient rows {rows} is not a complete SH band set "
        f"(expected one of {sorted(_REST_PER_DEGREE.values())})"
    )


def sh_basis_planes(
    dx: jnp.ndarray, dy: jnp.ndarray, dz: jnp.ndarray, degree: int
) -> Tuple[jnp.ndarray, ...]:
    """Real SH basis values (bands 1..degree) for unit directions.

    Args are (N,) direction-component planes; returns the
    ``_REST_PER_DEGREE[degree]`` basis planes in 3DGS coefficient order
    (band-major: l=1's three terms, then l=2's five, then l=3's seven).
    The DC band (constant ``SH_C0``) is excluded — it is baked into the
    base color by the loader.
    """
    if degree not in _REST_PER_DEGREE:
        raise ValueError(f"unsupported SH degree {degree} (max 3)")
    out = []
    if degree >= 1:
        out += [-SH_C1 * dy, SH_C1 * dz, -SH_C1 * dx]
    if degree >= 2:
        xx, yy, zz = dx * dx, dy * dy, dz * dz
        xy, yz, xz = dx * dy, dy * dz, dx * dz
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            SH_C3[0] * dy * (3.0 * xx - yy),
            SH_C3[1] * xy * dz,
            SH_C3[2] * dy * (4.0 * zz - xx - yy),
            SH_C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * dx * (4.0 * zz - xx - yy),
            SH_C3[5] * dz * (xx - yy),
            SH_C3[6] * dx * (xx - 3.0 * yy),
        ]
    return tuple(out)


def apply_sh(
    splats: Splats, sh: Optional[SHCoeffs], cam_pos: jnp.ndarray,
    degree: Optional[int] = None,
) -> Splats:
    """Evaluate view-dependent color for one camera position.

    Returns a new splat pytree whose ``cr/cg/cb`` planes are
    ``clip(base + sum_k basis_k(dir) * coeff_k, 0, 1)`` with
    ``dir = normalize(p - cam_pos)`` — the 3DGS appearance model.  The base
    color is whatever the splats carry (``load_ply(with_sh=True)`` leaves it
    as the unclipped DC response exactly so this composition is lossless).

    ``sh=None`` degrades to clipping the base color, so callers can wire
    this unconditionally.  ``degree`` (default: all loaded bands) truncates
    evaluation for a cheaper appearance LOD — coefficients beyond it are
    ignored, matching 3DGS's progressive-degree training convention.

    Jit-friendly: ``cam_pos`` is a traced (3,) array; per-frame calls with a
    moving camera never retrace.
    """
    full = sh_degree(sh)
    degree = full if degree is None else min(degree, full)
    if degree <= 0 or sh is None:
        out = dict(splats)
        for ch in ("cr", "cg", "cb"):
            out[ch] = jnp.clip(splats[ch], 0.0, 1.0)
        return out
    dx = splats["px"] - cam_pos[0]
    dy = splats["py"] - cam_pos[1]
    dz = splats["pz"] - cam_pos[2]
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
    basis = sh_basis_planes(dx * inv, dy * inv, dz * inv, degree)
    out = dict(splats)
    for ch, field in (("r", "cr"), ("g", "cg"), ("b", "cb")):
        c = splats[field]
        coeff = sh[ch]
        for k, b in enumerate(basis):
            c = c + b * coeff[k]
        out[field] = jnp.clip(c, 0.0, 1.0)
    return out


__all__ = [
    "SHCoeffs", "SH_C0", "SH_C1", "SH_C2", "SH_C3",
    "sh_degree", "sh_basis_planes", "apply_sh",
]
