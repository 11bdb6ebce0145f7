"""CSG scene graph and its compilation to a jittable scene-SDF function.

Counterpart of src/sdf/Scene.ts + src/sdf/CodeGenerator.ts +
src/sdf/ParameterEncoder.ts.  The reference compiles the scene tree to a WGSL
string and rebuilds the GPU pipeline when the structure hash changes
(src/GradientSampler.ts:108-133); parameter animation re-encodes a std140
uniform each frame (src/sdf/ParameterEncoder.ts:11-125).

Here, **tracing is the code generator**: `scene.sdf` is a plain Python
function that walks the (static) tree and emits XLA ops; `jax.jit` of any
consumer compiles it.  A structure change produces a new `structure_hash()`,
so engines key their jit caches on it.  Parameter animation is just passing a
fresh `scene.params()` pytree into the already-compiled function — no
alignment machinery, no recompile (SURVEY.md section 7 "Design translation").
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union as TUnion

import jax.numpy as jnp

from .ops import (
    Intersection,
    Operation,
    SmoothIntersection,
    SmoothSubtraction,
    SmoothUnion,
    Subtraction,
    Union,
)
from .primitives import Primitive, SdfResult, scale_aabb

# A scene node is either a primitive or (operation, [children]).
SceneNode = TUnion[Primitive, "OpNode"]


class OpNode:
    __slots__ = ("operation", "children")

    def __init__(self, operation: Operation, children: List[SceneNode]):
        self.operation = operation
        self.children = children


def _as_node(x) -> SceneNode:
    if isinstance(x, (Primitive, OpNode)):
        return x
    raise TypeError(f"not a scene node: {x!r}")


def union(a, b) -> OpNode:
    return OpNode(Union(), [_as_node(a), _as_node(b)])


def intersection(a, b) -> OpNode:
    return OpNode(Intersection(), [_as_node(a), _as_node(b)])


def subtraction(a, b) -> OpNode:
    return OpNode(Subtraction(), [_as_node(a), _as_node(b)])


def smooth_union(k: float, a, b) -> OpNode:
    return OpNode(SmoothUnion(k), [_as_node(a), _as_node(b)])


def smooth_intersection(k: float, a, b) -> OpNode:
    return OpNode(SmoothIntersection(k), [_as_node(a), _as_node(b)])


def smooth_subtraction(k: float, a, b) -> OpNode:
    return OpNode(SmoothSubtraction(k), [_as_node(a), _as_node(b)])


Params = Dict[str, Dict[str, jnp.ndarray]]


class SDFScene:
    """Mutable scene container (src/sdf/Scene.ts:72-152)."""

    def __init__(self, root: Optional[SceneNode] = None):
        self._root: Optional[SceneNode] = None
        self._primitives: Dict[str, Primitive] = {}
        if root is not None:
            self.set_root(root)

    # -- structure ----------------------------------------------------------
    def set_root(self, node: SceneNode) -> None:
        self._root = _as_node(node)
        self._primitives = {}
        self._collect(self._root)

    def _collect(self, node: SceneNode) -> None:
        if isinstance(node, Primitive):
            self._primitives[node.id] = node
        else:
            for c in node.children:
                self._collect(c)

    def get(self, id: str) -> Optional[Primitive]:
        return self._primitives.get(id)

    def __getitem__(self, id: str) -> Primitive:
        return self._primitives[id]

    @property
    def root(self) -> Optional[SceneNode]:
        return self._root

    def primitives(self) -> List[Primitive]:
        return list(self._primitives.values())

    def operations(self) -> List[Operation]:
        ops: List[Operation] = []

        def walk(node: SceneNode):
            if isinstance(node, OpNode):
                ops.append(node.operation)
                for c in node.children:
                    walk(c)

        if self._root is not None:
            walk(self._root)
        return ops

    def structure_hash(self) -> str:
        """Typed tree walk, the recompile-detection key
        (src/sdf/Scene.ts:140-151)."""

        def walk(node: SceneNode) -> str:
            if isinstance(node, Primitive):
                return f"P:{node.kind}:{node.id}"
            kids = ",".join(walk(c) for c in node.children)
            return f"O:{node.operation.kind}:({kids})"

        return walk(self._root) if self._root is not None else ""

    # -- parameters ---------------------------------------------------------
    def params(self) -> Params:
        """Snapshot all animatable parameters into a pytree.

        Replaces ParameterEncoder.encodeParameters (src/sdf/ParameterEncoder.ts:11-125):
        a pytree of named arrays needs no std140 padding.
        """
        out: Params = {}
        for p in self._primitives.values():
            out[p.id] = {k: jnp.asarray(v) for k, v in p.params().items()}
        for op in self.operations():
            op_params = op.params()
            if op_params:
                out[op.id] = {k: jnp.asarray(v) for k, v in op_params.items()}
        return out

    # -- evaluation ---------------------------------------------------------
    def sdf(self, p: jnp.ndarray, params: Params) -> SdfResult:
        """Evaluate (distance, gradient) at points p (..., 3).

        Counterpart of the generated `sceneSDF` (src/sdf/CodeGenerator.ts:279-353);
        the SSA emission there becomes ordinary expression evaluation here.
        Empty scene returns (1000, +y) like the reference (:283-286).
        """
        if self._root is None:
            dist = jnp.full(p.shape[:-1], 1000.0, dtype=p.dtype)
            grad = jnp.zeros_like(p).at[..., 1].set(1.0)
            return dist, grad

        def walk(node: SceneNode) -> SdfResult:
            if isinstance(node, Primitive):
                prim_params = params[node.id]
                return node.sdg(p - prim_params["center"], prim_params)
            a = walk(node.children[0])
            b = walk(node.children[1])
            op = node.operation
            op_params = params.get(getattr(op, "id", ""), {})
            return op.apply(a, b, op_params)

        return walk(self._root)

    def distance(self, p: jnp.ndarray, params: Params) -> jnp.ndarray:
        """Distance-only view, differentiable with jax.grad — the
        extensibility path for primitives without hand-derived gradients."""
        return self.sdf(p, params)[0]

    # -- bounds -------------------------------------------------------------
    def aabb(self, params: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Global AABB over all primitives, jit-traceable
        (src/PointManager.ts:192-214, without the 1.5x scale)."""
        prims = self.primitives()
        if not prims:
            one = jnp.ones(3, jnp.float32)
            return -one, one
        los, his = zip(*(prim.aabb(params[prim.id]) for prim in prims))
        lo = jnp.min(jnp.stack(los), axis=0)
        hi = jnp.max(jnp.stack(his), axis=0)
        return lo, hi

    def seeding_aabb(
        self, params: Params, scale: float = 1.5
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Global AABB grown by `scale` for point seeding
        (src/PointManager.ts:212-213)."""
        lo, hi = self.aabb(params)
        return scale_aabb(lo, hi, scale)
