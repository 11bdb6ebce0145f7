"""SDF -> mesh extraction (sdf/mesh.py surface nets).

Gates the three properties that make a mesh export trustworthy:
geometry (vertices on the zero set, normals = SDF gradients), topology
(watertight 2-manifold, correct Euler characteristic per genus), and
orientation (consistent outward winding).  The reference has no mesh path
(its only surface form is the splat cloud) — this is a beyond-parity
capability, so the gates are self-contained.
"""

from collections import Counter

import jax.numpy as jnp
import numpy as np
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu.sdf.mesh import extract_mesh, save_obj


def _edge_counts(faces):
    c = Counter()
    for t in faces:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            c[(min(a, b), max(a, b))] += 1
    return c


def _checks(scene, resolution):
    params = scene.params()
    m = extract_mesh(scene, params, resolution=resolution)
    V, F, N = m["vertices"], m["faces"], m["normals"]
    assert V.shape[1] == 3 and F.shape[1] == 3 and N.shape == V.shape
    assert F.min() >= 0 and F.max() < len(V)
    d = np.asarray(scene.distance(jnp.asarray(V), params))
    edges = _edge_counts(F)
    chi = len(V) - len(edges) + len(F)
    return m, d, edges, chi


class TestSurfaceNets:
    def test_sphere_geometry_topology_orientation(self):
        scene = spt.SDFScene(spt.Sphere(id="s", radius=0.5))
        m, d, edges, chi = _checks(scene, 32)
        V, F, N = m["vertices"], m["faces"], m["normals"]
        # geometry: Newton settles vertices onto the exact zero set
        assert np.abs(d).max() < 1e-4
        # radius recovered
        assert np.abs(np.linalg.norm(V, axis=1) - 0.5).max() < 1e-4
        # topology: closed 2-manifold sphere
        assert chi == 2
        assert set(edges.values()) == {2}
        # orientation: vertex normals radial, faces wound outward
        dots = np.sum(V * N, axis=1) / np.maximum(
            np.linalg.norm(V, axis=1), 1e-9
        )
        assert dots.min() > 0.99
        fn = np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]])
        ctr = V[F].mean(axis=1)
        assert (np.sum(fn * ctr, axis=1) > 0).all()

    def test_torus_genus(self):
        scene = spt.SDFScene(
            spt.Torus(id="t", major_radius=0.5, minor_radius=0.18)
        )
        m, d, edges, chi = _checks(scene, 40)
        assert np.abs(d).max() < 1e-4
        assert chi == 0  # genus 1
        assert set(edges.values()) == {2}

    def test_csg_smooth_union(self):
        # the demo scene's shape: still one closed genus-0 surface
        scene = spt.SDFScene(
            spt.smooth_union(
                0.15,
                spt.Sphere(id="s1", radius=0.5),
                spt.Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
            )
        )
        m, d, edges, chi = _checks(scene, 40)
        # smooth-union fields are bounds, not exact distances: Newton's
        # fixed 8 steps land within a small multiple of float tolerance
        assert np.abs(d).max() < 1e-3
        assert chi == 2
        assert set(edges.values()) == {2}

    def test_normals_match_sdf_gradient(self):
        scene = spt.SDFScene(
            spt.Torus(id="t", major_radius=0.5, minor_radius=0.2)
        )
        params = scene.params()
        m = extract_mesh(scene, params, resolution=32)
        _, g = scene.sdf(jnp.asarray(m["vertices"]), params)
        g = np.array(g)
        g /= np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-9)
        cos = np.sum(g * m["normals"], axis=1)
        assert cos.min() > 0.999

    def test_empty_scene(self):
        scene = spt.SDFScene()
        m = extract_mesh(scene, scene.params(), resolution=8)
        assert m["vertices"].shape == (0, 3)
        assert m["faces"].shape == (0, 3)

    def test_explicit_bounds_and_resolution_refinement(self):
        scene = spt.SDFScene(spt.Sphere(id="s", radius=0.5))
        params = scene.params()
        lo = np.float32([-0.8, -0.8, -0.8])
        hi = np.float32([0.8, 0.8, 0.8])
        coarse = extract_mesh(scene, params, resolution=12, bounds=(lo, hi))
        fine = extract_mesh(scene, params, resolution=24, bounds=(lo, hi))
        assert len(fine["vertices"]) > 2.5 * len(coarse["vertices"])
        # both already sit on the surface thanks to Newton refinement
        for m in (coarse, fine):
            d = np.asarray(scene.distance(jnp.asarray(m["vertices"]), params))
            assert np.abs(d).max() < 1e-4

    def test_save_obj_roundtrip(self, tmp_path):
        scene = spt.SDFScene(spt.Sphere(id="s", radius=0.4))
        m = extract_mesh(scene, scene.params(), resolution=16)
        path = str(tmp_path / "m.obj")
        save_obj(path, m)
        v, n, f = [], [], []
        for line in open(path):
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                v.append([float(x) for x in t[1:4]])
            elif t[0] == "vn":
                n.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                f.append([int(x.split("/")[0]) - 1 for x in t[1:4]])
        assert np.allclose(np.float32(v), m["vertices"], atol=1e-5)
        assert np.allclose(np.float32(n), m["normals"], atol=1e-5)
        assert np.array_equal(np.int32(f), m["faces"])

    def test_animation_no_structure_change(self):
        # parameter changes move the mesh without any topology surprises
        scene = spt.SDFScene(spt.Sphere(id="s", radius=0.3))
        params = scene.params()
        m1 = extract_mesh(scene, params, resolution=20)
        scene["s"].radius = 0.45
        m2 = extract_mesh(scene, scene.params(), resolution=20)
        r1 = np.linalg.norm(m1["vertices"], axis=1).mean()
        r2 = np.linalg.norm(m2["vertices"], axis=1).mean()
        assert r1 == pytest.approx(0.3, abs=1e-3)
        assert r2 == pytest.approx(0.45, abs=1e-3)
