"""CSG combination operators over (distance, gradient) fields.

Counterpart of the reference's generated WGSL operation library
(src/sdf/CodeGenerator.ts:180-226) and its CPU-side Operation classes
(src/sdf/Operation.ts).  Each op combines two `(dist, grad)` batches
elementwise with `jnp.where` selects — no control flow, fully fusable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .primitives import SdfResult

_next_op_id = [0]


def op_union(a: SdfResult, b: SdfResult) -> SdfResult:
    """min-union, selecting the nearer field's gradient
    (src/sdf/CodeGenerator.ts:183-189)."""
    da, ga = a
    db, gb = b
    take_a = da < db
    return jnp.where(take_a, da, db), jnp.where(take_a[..., None], ga, gb)


def op_intersection(a: SdfResult, b: SdfResult) -> SdfResult:
    """max-intersection (src/sdf/CodeGenerator.ts:192-198)."""
    da, ga = a
    db, gb = b
    take_a = da > db
    return jnp.where(take_a, da, db), jnp.where(take_a[..., None], ga, gb)


def op_subtraction(a: SdfResult, b: SdfResult) -> SdfResult:
    """a minus b = intersection(a, -b) (src/sdf/CodeGenerator.ts:201-204)."""
    db, gb = b
    return op_intersection(a, (-db, -gb))


def op_smooth_union(a: SdfResult, b: SdfResult, k) -> SdfResult:
    """Quadratic-polynomial smooth minimum with blended gradient
    (src/sdf/CodeGenerator.ts:207-224, after Inigo Quilez).

    k is normalized by 4 so it directly reads as blend thickness.
    """
    da, ga = a
    db, gb = b
    k4 = k * 4.0
    diff = jnp.abs(da - db)
    h = jnp.maximum(k4 - diff, 0.0) / k4
    dist = jnp.minimum(da, db) - h * h * k4 * 0.25

    h_grad = jnp.maximum(k4 - diff, 0.0) / (2.0 * k4)
    t = jnp.where(da < db, h_grad, 1.0 - h_grad)
    grad = ga + t[..., None] * (gb - ga)
    return dist, grad


def op_smooth_intersection(a: SdfResult, b: SdfResult, k) -> SdfResult:
    """Smooth maximum: -smin(-a, -b, k) — the standard dual of the smooth
    union (Quilez).  Beyond the reference's four-op library (its
    CodeGenerator has only the smooth UNION); gradient blending falls out
    of the duality, so the one verified blend implementation serves both."""
    da, ga = a
    db, gb = b
    d, g = op_smooth_union((-da, -ga), (-db, -gb), k)
    return -d, -g


def op_smooth_subtraction(a: SdfResult, b: SdfResult, k) -> SdfResult:
    """a minus b with a smooth fillet = smooth_intersection(a, -b)."""
    db, gb = b
    return op_smooth_intersection(a, (-db, -gb), k)


class Operation:
    """CSG operation node metadata (src/sdf/Operation.ts)."""

    kind = "op"

    def params(self) -> Dict[str, np.ndarray]:
        return {}

    def apply(self, a: SdfResult, b: SdfResult, params: Dict) -> SdfResult:
        raise NotImplementedError


class Union(Operation):
    kind = "union"

    def apply(self, a, b, params):
        return op_union(a, b)


class Intersection(Operation):
    kind = "intersection"

    def apply(self, a, b, params):
        return op_intersection(a, b)


class Subtraction(Operation):
    kind = "subtraction"

    def apply(self, a, b, params):
        return op_subtraction(a, b)


class SmoothUnion(Operation):
    """Smooth union with animatable blend radius k
    (src/sdf/Operation.ts:58-80 generates ids `smin_N`)."""

    kind = "smooth_union"

    def __init__(self, k: float, id: str | None = None):
        i = _next_op_id[0]
        _next_op_id[0] += 1
        self.id = id or f"smin_{i}"
        self.k = float(k)

    def params(self):
        return {"k": np.float32(self.k)}

    def apply(self, a, b, params):
        return op_smooth_union(a, b, params["k"])


class SmoothIntersection(Operation):
    kind = "smooth_intersection"

    def __init__(self, k: float, id: str | None = None):
        i = _next_op_id[0]
        _next_op_id[0] += 1
        self.id = id or f"smax_{i}"
        self.k = float(k)

    def params(self):
        return {"k": np.float32(self.k)}

    def apply(self, a, b, params):
        return op_smooth_intersection(a, b, params["k"])


class SmoothSubtraction(Operation):
    kind = "smooth_subtraction"

    def __init__(self, k: float, id: str | None = None):
        i = _next_op_id[0]
        _next_op_id[0] += 1
        self.id = id or f"ssub_{i}"
        self.k = float(k)

    def params(self):
        return {"k": np.float32(self.k)}

    def apply(self, a, b, params):
        return op_smooth_subtraction(a, b, params["k"])
