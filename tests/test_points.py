"""Point-engine tests: seeding distribution, surface projection convergence,
curvature probe behavior, splat property derivation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.points import (
    curvature_probe,
    derive_splats,
    point_count,
    project_to_surface,
    seed_points,
    seed_scene_points,
)
from splat_renderer_tpu.sdf import Box, SDFScene, Sphere, smooth_union, union


def _sphere_scene(radius=0.5):
    scene = SDFScene()
    scene.set_root(union(Sphere(id="a", radius=radius), Sphere(id="b", radius=radius)))
    return scene


class TestPointCount:
    def test_clamps(self):
        tiny = SDFScene()
        tiny.set_root(union(Sphere(id="a", radius=0.01), Sphere(id="b", radius=0.01)))
        assert point_count(tiny) == 10_000
        huge = SDFScene()
        huge.set_root(union(Sphere(id="a", radius=50.0), Sphere(id="b", radius=50.0)))
        assert point_count(huge) == 200_000

    def test_demo_scene_heuristic(self):
        # sphere r=.5: area pi, sqrt=1.772 -> 53k; box half .3: area 2.16,
        # sqrt=1.47 -> 44k; sphere r=.25: area .785, sqrt=.886 -> 26.5k
        s1 = Sphere(id="s1", radius=0.5)
        b1 = Box(id="b1", size=(0.3, 0.3, 0.3))
        s2 = Sphere(id="s2", radius=0.25)
        scene = SDFScene(smooth_union(0.1, smooth_union(0.15, s1, b1), s2))
        n = point_count(scene)
        assert 120_000 < n < 130_000


class TestSeeding:
    def test_points_on_box_surface(self, key):
        lo = jnp.array([-1.0, -2.0, -3.0])
        hi = jnp.array([1.0, 2.0, 3.0])
        pts = seed_points(key, lo, hi, 4096)
        assert pts.shape == (4096, 3)
        on_face = jnp.zeros(4096, bool)
        for ax in range(3):
            on_face |= jnp.isclose(pts[:, ax], lo[ax]) | jnp.isclose(pts[:, ax], hi[ax])
        assert jnp.all(on_face), "every point must lie on an AABB face"
        assert jnp.all(pts >= lo - 1e-6) and jnp.all(pts <= hi + 1e-6)

    def test_face_choice_proportional_to_area(self, key):
        # Flat slab: z-faces dominate (dx*dy >> others)
        lo = jnp.array([-1.0, -1.0, -0.01])
        hi = jnp.array([1.0, 1.0, 0.01])
        pts = seed_points(key, lo, hi, 8192)
        frac_z = jnp.mean(
            jnp.isclose(pts[:, 2], lo[2]) | jnp.isclose(pts[:, 2], hi[2])
        )
        # z faces are 2*2 / (2*2 + tiny) of the area each
        assert frac_z > 0.95

    def test_scene_seeding_uses_scaled_aabb(self, key):
        scene = _sphere_scene(radius=1.0)
        pts = seed_scene_points(key, scene, scene.params(), 512)
        # seeding AABB = [-1,1]^3 scaled 1.5 = [-1.5, 1.5]^3
        assert jnp.max(jnp.abs(pts)) <= 1.5 + 1e-5
        assert jnp.max(jnp.abs(pts)) > 1.2  # actually uses the margin


class TestProjection:
    def test_converges_to_sphere_surface(self, key):
        scene = _sphere_scene(radius=0.5)
        params = scene.params()
        pts = seed_scene_points(key, scene, params, 2048)
        out = project_to_surface(scene, params, pts, steps=5)
        d, _ = scene.sdf(out, params)
        assert float(jnp.max(jnp.abs(d))) < 1e-3

    def test_demo_scene_residuals_small(self, key):
        s1 = Sphere(id="s1", radius=0.5)
        b1 = Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
        scene = SDFScene(smooth_union(0.15, s1, b1))
        params = scene.params()
        pts = seed_scene_points(key, scene, params, 4096)
        out = project_to_surface(scene, params, pts, steps=5)
        d, _ = scene.sdf(out, params)
        # smooth blends are not exact SDFs; most points should still land
        assert float(jnp.quantile(jnp.abs(d), 0.95)) < 5e-3

    def test_whole_update_jits_once(self, key):
        scene = _sphere_scene()
        traces = []

        @jax.jit
        def step(params, k):
            traces.append(1)
            pts = seed_scene_points(k, scene, params, 256)
            return project_to_surface(scene, params, pts, steps=5)

        step(scene.params(), key)
        scene["a"].radius = 0.7
        step(scene.params(), jax.random.PRNGKey(1))
        assert len(traces) == 1


class TestCurvature:
    def test_sphere_flat_vs_edge(self, key):
        """Large sphere surface reads ~flat (scale ~1); a box edge reads
        curved (scale << 1)."""
        sphere = SDFScene(union(Sphere(id="a", radius=1.0), Sphere(id="b", radius=1.0)))
        params = sphere.params()
        pts = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
        n, s = curvature_probe(sphere, params, pts)
        np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-5)
        assert s[0] > 0.9

        box_scene = SDFScene(
            union(Box(id="c", size=(0.5, 0.5, 0.5)), Box(id="d", size=(0.5, 0.5, 0.5)))
        )
        edge_pt = jnp.array([[0.5, 0.5, 0.0]], jnp.float32)  # on an edge
        _, s_edge = curvature_probe(box_scene, box_scene.params(), edge_pt)
        assert s_edge[0] < 0.5

    def test_shapes(self, key):
        scene = _sphere_scene()
        pts = jax.random.normal(key, (128, 3))
        n, s = curvature_probe(scene, scene.params(), pts)
        assert n.shape == (128, 3) and s.shape == (128,)
        assert jnp.all((s >= 0.01 - 1e-6) & (s <= 1.0 + 1e-6))


class TestProperties:
    def test_derive(self, key):
        pos = jax.random.normal(key, (64, 3))
        normals = jnp.zeros((64, 3)).at[:, 2].set(1.0)
        scales = jnp.full((64,), 0.5)
        cfg = RenderConfig()
        s = derive_splats(pos, normals, scales, cfg)
        np.testing.assert_allclose(s["radius"], cfg.base_radius * 0.5, atol=1e-7)
        # color = |n|*0.8+0.2 -> z channel 1.0, xy 0.2 (plane SoA fields)
        np.testing.assert_allclose(s["cb"], 1.0, atol=1e-6)
        np.testing.assert_allclose(s["cr"], 0.2, atol=1e-6)
        np.testing.assert_allclose(s["opacity"], cfg.base_opacity)
