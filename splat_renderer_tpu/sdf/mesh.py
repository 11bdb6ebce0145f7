"""SDF -> triangle-mesh extraction (surface nets) and OBJ export.

The reference is a point/splat modeler with no mesh path at all — its only
surface representation is the splat cloud sampled by PointManager
(src/PointManager.ts:150-214).  Mesh export is the natural missing exit for
an SDF modeler, so this module adds it the TPU way:

- **device**: the (R+1)^3 distance grid is one jitted `lax.map` over z-slabs
  (static shapes, each slab a (R+1)^2-point batch through `SDFScene.sdf`),
  and vertex refinement reuses the engine's Newton projector
  (points/projection.py — the same `lax.scan` that settles seed points,
  src/main.ts:149-172) plus one SDF-gradient batch for per-vertex normals.
- **host**: topology only — boolean shifts over the sign grid pick active
  cells and crossing edges, and integer bookkeeping assembles the index
  buffers.  Nothing here is per-element Python; it is a handful of
  numpy slice-sums at R^3 scale.

Why surface nets instead of marching cubes: SN needs no 256-case tables
(nothing to transcribe wrong), produces exactly one vertex per sign-change
cell, and pairs naturally with an SDF — the vertex starts at the centroid of
the cell's edge crossings (the classic SN estimate) and then Newton-projects
onto the *exact* zero set, which marching cubes' per-edge interpolation can't
do.  The output is a closed 2-manifold whenever the surface stays inside the
sampled bounds (every interior crossing edge emits exactly one quad, and
every quad edge is shared by exactly two quads); tests gate Euler
characteristics (sphere chi=2, torus chi=0) and watertightness.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..points.projection import project_to_surface
from .scene import Params, SDFScene


def _grid_distances(
    scene: SDFScene, params: Params, lo: np.ndarray, spacing: np.ndarray, r: int
) -> np.ndarray:
    """(r+1)^3 signed distances, evaluated on device one z-slab at a time.

    lax.map keeps the per-call footprint at one (r+1)^2 x 3 batch — the
    (N, 3) lane-padding tax (CLAUDE.md) stays bounded no matter the
    resolution — while the whole sweep is still a single jitted program.
    """
    n1 = r + 1
    ax = [lo[d] + spacing[d] * np.arange(n1, dtype=np.float32) for d in range(3)]
    xs = jnp.asarray(np.repeat(ax[0], n1))          # (n1*n1,) slab x coords
    ys = jnp.asarray(np.tile(ax[1], n1))            # (n1*n1,) slab y coords
    zs = jnp.asarray(ax[2])                         # (n1,)

    @jax.jit
    def sweep(zs):
        def slab(z):
            p = jnp.stack([xs, ys, jnp.full_like(xs, z)], axis=-1)
            return scene.sdf(p, params)[0]          # grads dead-code away

        return jax.lax.map(slab, zs)                # (n1, n1*n1) z-major

    d = np.asarray(sweep(zs))                       # (n1, x*y)
    # reorder to [x, y, z] indexing: slab axis is z, rows are x-major
    return np.moveaxis(d.reshape(n1, n1, n1), 0, 2)


def _edge_contrib(cross: np.ndarray, coords: Tuple[np.ndarray, ...], axis: int):
    """Per-cell sums of one axis's crossing-edge zero points.

    An edge at grid index (i, j, k) along `axis` touches the four cells
    offset by {0,-1} in the two transverse axes; summing the four shifted
    slices accumulates every edge into every cell it borders.
    """
    # cross has shape (R, R+1, R+1) up to axis permutation; cells are (R,R,R)
    t = [a for a in range(3) if a != axis]
    w = cross.astype(np.float32)
    planes = [w] + [w * c for c in coords]
    out = []
    for p in planes:
        acc = None
        for da in (0, 1):
            for db in (0, 1):
                sl = [slice(None)] * 3
                sl[t[0]] = slice(da, p.shape[t[0]] - 1 + da)
                sl[t[1]] = slice(db, p.shape[t[1]] - 1 + db)
                piece = p[tuple(sl)]
                acc = piece if acc is None else acc + piece
        out.append(acc)
    return out[0], out[1:]


def extract_mesh(
    scene: SDFScene,
    params: Params,
    resolution: int = 96,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    newton_steps: int = 8,
    margin: float = 0.08,
) -> Dict[str, np.ndarray]:
    """Extract a triangle mesh of the scene's zero level set.

    resolution: cells per axis (samples = resolution + 1).
    bounds: (lo, hi) world AABB to sample; default scene.aabb grown by
      `margin` of its diagonal (the surface must stay strictly inside —
      boundary-crossing edges emit no faces, like any grid extractor).
    newton_steps: SDF Newton refinement iterations per vertex (8 suits
      exact fields; smooth-union/ellipsoid bound fields flatten |grad| and
      converge in ~12 — see sdf/primitives.py notes).

    Returns {"vertices" (V, 3) f32, "faces" (F, 3) i32 (CCW, outward),
    "normals" (V, 3) f32 (unit SDF gradients)}.
    """
    if resolution < 2:
        raise ValueError("resolution must be >= 2")
    if bounds is None:
        lo_j, hi_j = scene.aabb(params)
        lo = np.asarray(lo_j, np.float32)
        hi = np.asarray(hi_j, np.float32)
        pad = margin * float(np.linalg.norm(hi - lo) + 1e-6)
        lo, hi = lo - pad, hi + pad
    else:
        lo = np.asarray(bounds[0], np.float32)
        hi = np.asarray(bounds[1], np.float32)
    r = int(resolution)
    spacing = (hi - lo) / r

    dist = _grid_distances(scene, params, lo, spacing, r)
    inside = dist < 0.0

    # ---- active cells: some but not all of the 8 corners inside ----
    occ = np.zeros((r, r, r), np.uint8)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                occ += inside[dx : r + dx, dy : r + dy, dz : r + dz]
    active = (occ > 0) & (occ < 8)
    n_active = int(active.sum())
    empty = {
        "vertices": np.zeros((0, 3), np.float32),
        "faces": np.zeros((0, 3), np.int32),
        "normals": np.zeros((0, 3), np.float32),
    }
    if n_active == 0:
        return empty

    vert_of_cell = np.full((r, r, r), -1, np.int64)
    vert_of_cell[active] = np.arange(n_active)

    # ---- surface-nets vertex estimate: centroid of edge crossings ----
    sum_w = np.zeros((r, r, r), np.float32)
    sum_p = [np.zeros((r, r, r), np.float32) for _ in range(3)]
    crossings = []
    for axis in range(3):
        lo_sl = [slice(None)] * 3
        hi_sl = [slice(None)] * 3
        lo_sl[axis] = slice(0, r)
        hi_sl[axis] = slice(1, r + 1)
        d0 = dist[tuple(lo_sl)]
        d1 = dist[tuple(hi_sl)]
        cross = inside[tuple(lo_sl)] != inside[tuple(hi_sl)]
        crossings.append(cross)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(cross, d0 / np.where(cross, d0 - d1, 1.0), 0.0)
        # grid-unit coordinates of each edge's zero point
        shape = d0.shape
        grids = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                            indexing="ij")
        coords = [g.copy() for g in grids]
        coords[axis] = coords[axis] + t
        w, sums = _edge_contrib(cross, tuple(coords), axis)
        sum_w += w
        for c in range(3):
            sum_p[c] += sums[c]

    w_act = np.maximum(sum_w[active], 1e-9)
    verts_grid = np.stack([sum_p[c][active] / w_act for c in range(3)], axis=1)
    verts = lo[None, :] + verts_grid * spacing[None, :]

    # ---- device Newton refinement onto the exact zero set ----
    if newton_steps > 0:
        cap = 1 << max(int(math.ceil(math.log2(max(n_active, 1)))), 6)
        pad = np.zeros((cap - n_active, 3), np.float32)
        pts = jnp.asarray(np.concatenate([verts.astype(np.float32), pad]))
        settled = np.asarray(
            jax.jit(
                lambda p: project_to_surface(scene, params, p, newton_steps)
            )(pts)
        )[:n_active]
        # keep each vertex near its own cell: Newton may slide along the
        # surface but must not jump sheets (topology came from the grid)
        cell_lo = lo[None, :] + np.argwhere(active).astype(np.float32) * spacing
        lim = spacing[None, :]
        verts = np.clip(settled, cell_lo - lim, cell_lo + 2.0 * lim)

    # ---- faces: one quad per interior crossing edge ----
    tris = []
    for axis in range(3):
        t0, t1 = [a for a in range(3) if a != axis]
        cross = crossings[axis]
        # interior in both transverse axes (all 4 neighbor cells exist)
        sl = [slice(None)] * 3
        sl[t0] = slice(1, r)
        sl[t1] = slice(1, r)
        sl[axis] = slice(0, r)
        e = np.argwhere(cross[tuple(sl)])
        if e.size == 0:
            continue
        # undo the slice offsets: argwhere is over the sliced view
        off = np.zeros(3, np.int64)
        off[t0] = 1
        off[t1] = 1
        e = e + off[None, :]
        base = [e[:, 0], e[:, 1], e[:, 2]]

        def cell(da: int, db: int):
            c = [b.copy() for b in base]
            c[t0] = c[t0] - da
            c[t1] = c[t1] - db
            return vert_of_cell[c[0], c[1], c[2]]

        # the (v00 -> v10 -> v11 -> v01) loop is CCW in the (t0, t1) plane,
        # i.e. its normal points along t0 x t1: +axis for x and z (cyclic
        # pairs), -axis for y ((x, z) is anti-cyclic).  Outward = +axis
        # exactly when the edge's LOW sample is inside.
        v00, v10, v11, v01 = cell(1, 1), cell(0, 1), cell(0, 0), cell(1, 0)
        lo_in = inside[e[:, 0], e[:, 1], e[:, 2]]
        keep = lo_in if axis != 1 else ~lo_in
        q = np.stack([v00, v10, v11, v01], axis=1)
        quads = np.where(keep[:, None], q, q[:, ::-1])
        tris.append(quads[:, [0, 1, 2]])
        tris.append(quads[:, [0, 2, 3]])

    if not tris:
        return empty
    faces = np.concatenate(tris).astype(np.int32)
    assert faces.min() >= 0, "boundary cell referenced — grow bounds/margin"

    # ---- normals: unit SDF gradients at the final vertices (device) ----
    cap = 1 << max(int(math.ceil(math.log2(max(n_active, 1)))), 6)
    pad = np.zeros((cap - n_active, 3), np.float32)
    pts = jnp.asarray(np.concatenate([verts.astype(np.float32), pad]))
    g = np.asarray(jax.jit(lambda p: scene.sdf(p, params)[1])(pts))[:n_active]
    nrm = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-9)

    return {
        "vertices": verts.astype(np.float32),
        "faces": faces,
        "normals": nrm.astype(np.float32),
    }


def save_obj(path: str, mesh: Dict[str, np.ndarray]) -> None:
    """Write a Wavefront OBJ (positions, normals, triangles; 1-indexed)."""
    v = np.asarray(mesh["vertices"], np.float32)
    f = np.asarray(mesh["faces"], np.int32) + 1
    n = np.asarray(mesh.get("normals", np.zeros((0, 3))), np.float32)
    with open(path, "w") as fh:
        fh.write("# splat_renderer_tpu surface-nets export\n")
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for p in n:
            fh.write(f"vn {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if len(n) == len(v) and len(v):
            for t in f:
                fh.write(
                    f"f {t[0]}//{t[0]} {t[1]}//{t[1]} {t[2]}//{t[2]}\n"
                )
        else:
            for t in f:
                fh.write(f"f {t[0]} {t[1]} {t[2]}\n")
