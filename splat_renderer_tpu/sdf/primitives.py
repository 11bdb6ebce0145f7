"""SDF primitives with analytic gradients, vectorized over point batches.

TPU-native counterpart of the reference's generated WGSL primitive library
(`sdgSphere/Box/Torus/Capsule`, src/sdf/CodeGenerator.ts:98-175) and its
CPU-side primitive classes (src/sdf/Primitive.ts).  Where the reference emits
one scalar WGSL function evaluated per GPU thread, we evaluate each primitive
for a whole (N, 3) batch of points at once — the vectorization *is* the SIMT
parallelism, and XLA fuses the whole CSG tree into one program.

Every `sdg_*` function takes points already translated into the primitive's
local frame and returns `(dist, grad)` with shapes `(...,)` and `(..., 3)`.
All branches are `jnp.where`-based so the functions are jit/vmap/grad-safe.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
SdfResult = Tuple[Array, Array]  # (dist (...,), grad (..., 3))

_EPS = 1e-4


def _length(v: Array, axis: int = -1) -> Array:
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def sdg_sphere(p: Array, radius: Array) -> SdfResult:
    """Sphere distance + gradient (src/sdf/CodeGenerator.ts:100-105)."""
    d = _length(p)
    dist = d - radius
    grad = p / jnp.maximum(d, _EPS)[..., None]
    return dist, grad


def sdg_box(p: Array, half_size: Array) -> SdfResult:
    """Box distance + gradient (src/sdf/CodeGenerator.ts:108-132).

    Outside: grad = sign(p) * normalize(max(q, 0)).
    Inside: gradient points at the nearest face, with the reference's exact
    tie-breaking (x wins only on strict >, then y, else z).
    """
    q = jnp.abs(p) - half_size
    w = jnp.maximum(q, 0.0)
    wlen = _length(w)
    g = jnp.max(q, axis=-1)
    dist = wlen + jnp.minimum(g, 0.0)

    s = jnp.sign(p)
    grad_out = s * (w / jnp.maximum(wlen, _EPS)[..., None])

    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    pick_x = (qx > qy) & (qx > qz)
    pick_y = (~pick_x) & (qy > qz)
    axis_onehot = jnp.stack(
        [
            jnp.where(pick_x, 1.0, 0.0),
            jnp.where(pick_y, 1.0, 0.0),
            jnp.where(pick_x | pick_y, 0.0, 1.0),
        ],
        axis=-1,
    )
    grad_in = s * axis_onehot
    grad = jnp.where((g > 0.0)[..., None], grad_out, grad_in)
    return dist, grad


def sdg_torus(p: Array, major: Array, minor: Array) -> SdfResult:
    """Torus (ring in the xz-plane) distance + gradient
    (src/sdf/CodeGenerator.ts:135-155)."""
    pxz = p[..., jnp.array([0, 2])]
    lxz = _length(pxz)
    q = jnp.stack([lxz - major, p[..., 1]], axis=-1)
    lq = _length(q)
    dist = lq - minor

    ok = (lxz > _EPS) & (lq > _EPS)
    safe_lxz = jnp.maximum(lxz, _EPS)
    safe_lq = jnp.maximum(lq, _EPS)
    dxz = pxz / safe_lxz[..., None]
    dd = q / safe_lq[..., None]
    grad_ok = jnp.stack(
        [dxz[..., 0] * dd[..., 0], dd[..., 1], dxz[..., 1] * dd[..., 0]],
        axis=-1,
    )
    grad_fallback = jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0], dtype=p.dtype), grad_ok.shape
    )
    grad = jnp.where(ok[..., None], grad_ok, grad_fallback)
    return dist, grad


def sdg_capsule(p: Array, height: Array, radius: Array) -> SdfResult:
    """Vertical capsule distance + gradient (src/sdf/CodeGenerator.ts:158-173)."""
    half_h = height * 0.5
    py = jnp.clip(p[..., 1], -half_h, half_h)
    q = p - jnp.stack([jnp.zeros_like(py), py, jnp.zeros_like(py)], axis=-1)
    d = _length(q)
    dist = d - radius
    grad_ok = q / jnp.maximum(d, _EPS)[..., None]
    zero = jnp.zeros_like(p[..., 0])
    grad_fallback = jnp.stack([zero, jnp.sign(p[..., 1]), zero], axis=-1)
    grad = jnp.where((d > _EPS)[..., None], grad_ok, grad_fallback)
    return dist, grad


def sdg_cylinder(p: Array, height: Array, radius: Array) -> SdfResult:
    """Capped vertical cylinder distance + gradient.

    Beyond the reference's four-primitive library (its CodeGenerator has no
    cylinder); the standard exact SDF (Quilez, sdCappedCylinder) with the
    gradient derived in the same select style as sdg_box: radial/axial
    contributions outside, nearest-face one-hot inside.
    """
    hh = height * 0.5
    pxz = p[..., jnp.array([0, 2])]
    rl = _length(pxz)
    qx = rl - radius
    qy = jnp.abs(p[..., 1]) - hh
    wx = jnp.maximum(qx, 0.0)
    wy = jnp.maximum(qy, 0.0)
    outside = jnp.sqrt(wx * wx + wy * wy)
    dist = outside + jnp.minimum(jnp.maximum(qx, qy), 0.0)

    safe_rl = jnp.maximum(rl, _EPS)
    rx = jnp.where(rl > _EPS, pxz[..., 0] / safe_rl, 1.0)
    rz = jnp.where(rl > _EPS, pxz[..., 1] / safe_rl, 0.0)
    sy = jnp.where(p[..., 1] >= 0.0, 1.0, -1.0)
    inv_out = 1.0 / jnp.maximum(outside, _EPS)
    grad_out = jnp.stack(
        [wx * rx * inv_out, wy * sy * inv_out, wx * rz * inv_out], axis=-1
    )
    pick_r = qx > qy  # nearest interior face: side wall vs cap
    grad_in = jnp.stack(
        [
            jnp.where(pick_r, rx, 0.0),
            jnp.where(pick_r, 0.0, sy),
            jnp.where(pick_r, rz, 0.0),
        ],
        axis=-1,
    )
    is_out = (qx > 0.0) | (qy > 0.0)
    return dist, jnp.where(is_out[..., None], grad_out, grad_in)


def sdg_ellipsoid(p: Array, radii: Array) -> SdfResult:
    """Axis-aligned ellipsoid: Quilez's first-order bound
    k0*(k0-1)/k1 (exact for equal radii — reduces to the sphere SDF) with
    ITS OWN analytic gradient, so the autodiff gate applies unchanged.

    Not a true distance off-axis (it under/over-estimates by O(eccentricity))
    but 1-Lipschitz-ish and smooth — Newton projection (points/projection.py)
    converges on it like on any of the exact fields.
    """
    r2 = radii * radii
    pr = p / radii
    pr2 = p / r2
    k0 = _length(pr)
    k1 = _length(pr2)
    safe_k0 = jnp.maximum(k0, _EPS)
    safe_k1 = jnp.maximum(k1, _EPS)
    dist = k0 * (k0 - 1.0) / safe_k1
    # d = (k0^2 - k0)/k1;  ∇k0 = pr2/k0,  ∇k1 = (p/r^4)/k1
    gk0 = pr2 / safe_k0[..., None]
    gk1 = (pr2 / r2) / safe_k1[..., None]
    grad = (
        (2.0 * k0 - 1.0)[..., None] * gk0
        - (k0 * (k0 - 1.0) / safe_k1)[..., None] * gk1
    ) / safe_k1[..., None]
    # center: the quotient form degenerates (0/0); the true nearest surface
    # is along the smallest radius — any fixed unit vector is defensible
    center = k0 < _EPS
    dist = jnp.where(center, -jnp.min(radii, axis=-1), dist)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], p.dtype), grad.shape)
    grad = jnp.where(center[..., None], up, grad)
    return dist, grad


def sdg_round_box(p: Array, half_size: Array, rounding: Array) -> SdfResult:
    """Rounded box: the box field of the INNER core minus the rounding
    radius (Quilez sdRoundBox).  `half_size` is the OUTER half-extent, so
    AABB/footprint logic reads it directly; the gradient is the core box's
    (a constant offset leaves it untouched)."""
    inner = jnp.maximum(half_size - rounding, _EPS)
    d, g = sdg_box(p, inner)
    return d - rounding, g


# ---------------------------------------------------------------------------
# Primitive classes: the mutable, animatable CPU-side scene objects.
# Counterpart of src/sdf/Primitive.ts.  Parameters are plain numpy so the user
# can mutate them per frame (src/main.ts:113-116); `params()` snapshots them
# into the pytree handed to the jitted scene function — animation never
# triggers a recompile, only structure changes do.
# ---------------------------------------------------------------------------

_next_id = [0]


def _fresh_id() -> str:
    i = _next_id[0]
    _next_id[0] += 1
    return f"prim_{i}"


class Primitive:
    """Base primitive: id + world position (src/sdf/Primitive.ts:40-57)."""

    kind = "primitive"

    def __init__(self, id: str | None = None, position=(0.0, 0.0, 0.0)):
        self.id = id or _fresh_id()
        self.position = np.asarray(position, dtype=np.float32).copy()

    # --- interface ---
    def params(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def sdg(self, local_p: Array, params: Dict[str, Array]) -> SdfResult:
        """Evaluate distance+gradient at points in the primitive's local frame."""
        raise NotImplementedError

    def aabb(self, params: Dict[str, Array]) -> Tuple[Array, Array]:
        """Axis-aligned bounds (min, max) as jnp arrays, jit-traceable."""
        raise NotImplementedError

    def surface_area(self) -> float:
        raise NotImplementedError

    def clone(self) -> "Primitive":
        raise NotImplementedError


class Sphere(Primitive):
    kind = "sphere"

    def __init__(self, id=None, position=(0, 0, 0), radius: float = 0.5):
        super().__init__(id, position)
        self.radius = float(radius)

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "radius": np.float32(self.radius),
        }

    def sdg(self, local_p, params):
        return sdg_sphere(local_p, params["radius"])

    def aabb(self, params):
        r = params["radius"]
        c = params["center"]
        return c - r, c + r

    def surface_area(self):
        return 4.0 * math.pi * self.radius**2

    def clone(self):
        return Sphere(self.id, self.position.copy(), self.radius)


class Box(Primitive):
    """Box with half-extents `size` (src/sdf/Primitive.ts:111-165 — note the
    reference's AABB/surface-area treat `size` as half-extents too)."""

    kind = "box"

    def __init__(self, id=None, position=(0, 0, 0), size=(0.5, 0.5, 0.5)):
        super().__init__(id, position)
        self.size = np.asarray(size, dtype=np.float32).copy()

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "size": np.asarray(self.size, np.float32),
        }

    def sdg(self, local_p, params):
        return sdg_box(local_p, params["size"])

    def aabb(self, params):
        return params["center"] - params["size"], params["center"] + params["size"]

    def surface_area(self):
        w, h, d = (2 * float(s) for s in self.size)
        return 2.0 * (w * h + w * d + h * d)

    def clone(self):
        return Box(self.id, self.position.copy(), self.size.copy())


class Torus(Primitive):
    kind = "torus"

    def __init__(self, id=None, position=(0, 0, 0), major_radius=0.5, minor_radius=0.2):
        super().__init__(id, position)
        self.major_radius = float(major_radius)
        self.minor_radius = float(minor_radius)

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "major": np.float32(self.major_radius),
            "minor": np.float32(self.minor_radius),
        }

    def sdg(self, local_p, params):
        return sdg_torus(local_p, params["major"], params["minor"])

    def aabb(self, params):
        outer = params["major"] + params["minor"]
        c = params["center"]
        lo = c - jnp.stack([outer, params["minor"], outer])
        hi = c + jnp.stack([outer, params["minor"], outer])
        return lo, hi

    def surface_area(self):
        return 4.0 * math.pi**2 * self.major_radius * self.minor_radius

    def clone(self):
        return Torus(self.id, self.position.copy(), self.major_radius, self.minor_radius)


class Capsule(Primitive):
    kind = "capsule"

    def __init__(self, id=None, position=(0, 0, 0), height=1.0, radius=0.3):
        super().__init__(id, position)
        self.height = float(height)
        self.radius = float(radius)

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "height": np.float32(self.height),
            "radius": np.float32(self.radius),
        }

    def sdg(self, local_p, params):
        return sdg_capsule(local_p, params["height"], params["radius"])

    def aabb(self, params):
        c = params["center"]
        r = params["radius"]
        half_h = params["height"] * 0.5
        ext = jnp.stack([r, half_h + r, r])
        return c - ext, c + ext

    def surface_area(self):
        return 2 * math.pi * self.radius * self.height + 4 * math.pi * self.radius**2

    def clone(self):
        return Capsule(self.id, self.position.copy(), self.height, self.radius)


class Cylinder(Primitive):
    """Capped vertical cylinder — a primitive the reference's library lacks
    (its CodeGenerator stops at sphere/box/torus/capsule); same class
    contract (params/sdg/aabb/surface_area/clone) so the scene graph,
    seeding, and fitting consume it unchanged."""

    kind = "cylinder"

    def __init__(self, id=None, position=(0, 0, 0), height=1.0, radius=0.3):
        super().__init__(id, position)
        self.height = float(height)
        self.radius = float(radius)

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "height": np.float32(self.height),
            "radius": np.float32(self.radius),
        }

    def sdg(self, local_p, params):
        return sdg_cylinder(local_p, params["height"], params["radius"])

    def aabb(self, params):
        c = params["center"]
        r = params["radius"]
        ext = jnp.stack([r, params["height"] * 0.5, r])
        return c - ext, c + ext

    def surface_area(self):
        return 2 * math.pi * self.radius * (self.height + self.radius)

    def clone(self):
        return Cylinder(self.id, self.position.copy(), self.height, self.radius)


class Ellipsoid(Primitive):
    kind = "ellipsoid"

    def __init__(self, id=None, position=(0, 0, 0), radii=(0.5, 0.3, 0.4)):
        super().__init__(id, position)
        self.radii = np.asarray(radii, dtype=np.float32).copy()

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "radii": np.asarray(self.radii, np.float32),
        }

    def sdg(self, local_p, params):
        return sdg_ellipsoid(local_p, params["radii"])

    def aabb(self, params):
        return params["center"] - params["radii"], params["center"] + params["radii"]

    def surface_area(self):
        # Thomsen's approximation (max error ~1.06% — plenty for the
        # area-proportional seeding budget)
        a, b, c = (float(r) for r in self.radii)
        p = 1.6075
        return 4.0 * math.pi * (
            ((a * b) ** p + (a * c) ** p + (b * c) ** p) / 3.0
        ) ** (1.0 / p)

    def clone(self):
        return Ellipsoid(self.id, self.position.copy(), self.radii.copy())


class RoundBox(Primitive):
    """Box with rounded edges/corners; `size` is the OUTER half-extent."""

    kind = "round_box"

    def __init__(self, id=None, position=(0, 0, 0), size=(0.5, 0.5, 0.5),
                 rounding=0.1):
        super().__init__(id, position)
        self.size = np.asarray(size, dtype=np.float32).copy()
        self.rounding = float(rounding)

    def params(self):
        return {
            "center": np.asarray(self.position, np.float32),
            "size": np.asarray(self.size, np.float32),
            "rounding": np.float32(self.rounding),
        }

    def sdg(self, local_p, params):
        return sdg_round_box(local_p, params["size"], params["rounding"])

    def aabb(self, params):
        return params["center"] - params["size"], params["center"] + params["size"]

    def surface_area(self):
        # exact: inner faces + quarter-cylinder edges + sphere corners
        r = min(self.rounding, float(self.size.min()))
        w, h, d = (2.0 * max(float(s) - r, 0.0) for s in self.size)
        return (
            2.0 * (w * h + w * d + h * d)
            + 2.0 * math.pi * r * (w + h + d)
            + 4.0 * math.pi * r * r
        )

    def clone(self):
        return RoundBox(self.id, self.position.copy(), self.size.copy(),
                        self.rounding)


def scale_aabb(lo: Array, hi: Array, scale: float) -> Tuple[Array, Array]:
    """Grow an AABB about its center.

    The reference's `scaleAABB` (src/sdf/Primitive.ts:283-290) computes
    `center = min + max/2` — a reused-temporary bug; we use the correct
    midpoint (divergence documented here intentionally).
    """
    center = (lo + hi) * 0.5
    ext = (hi - lo) * (scale * 0.5)
    return center - ext, center + ext
