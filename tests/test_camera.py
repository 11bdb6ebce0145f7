"""Camera math tests: orbit parameterization, look-at/perspective sanity,
controller clamps (src/Camera.ts, src/OrbitCameraController.ts)."""

import math

import numpy as np
import pytest

from splat_renderer_tpu.camera import (
    Camera,
    OrbitCameraController,
    look_at,
    orbit_ring,
    perspective,
)


def _project(vp, p):
    h = vp @ np.append(np.asarray(p, np.float32), 1.0)
    return h[:3] / h[3]


class TestCamera:
    def test_default_position(self):
        cam = Camera()
        pos = cam.position()
        # distance 3, azimuth 0.5, elevation 0.5 (src/Camera.ts:24-27)
        ce = math.cos(0.5)
        np.testing.assert_allclose(
            pos,
            [3 * ce * math.sin(0.5), 3 * math.sin(0.5), 3 * ce * math.cos(0.5)],
            atol=1e-6,
        )

    def test_target_projects_to_center(self):
        cam = Camera(azimuth=1.2, elevation=0.4, distance=5.0)
        cam.target = np.array([0.3, -0.2, 0.8], np.float32)
        ndc = _project(cam.view_projection_matrix(), cam.target)
        np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-5)

    def test_depth_ordering_in_ndc(self):
        cam = Camera(azimuth=0.0, elevation=0.0, distance=3.0)
        # camera at (0,0,3) looking at origin; nearer point has smaller ndc z
        near = _project(cam.view_projection_matrix(), [0, 0, 1.0])
        far = _project(cam.view_projection_matrix(), [0, 0, -1.0])
        assert near[2] < far[2]

    def test_view_matrix_maps_eye_to_origin(self):
        cam = Camera(azimuth=0.7, elevation=-0.3)
        v = cam.view_matrix()
        eye_h = v @ np.append(cam.position(), 1.0)
        np.testing.assert_allclose(eye_h[:3], 0.0, atol=1e-5)

    def test_elevation_clamp(self):
        cam = Camera()
        cam.rotate(0.0, 10.0)
        assert cam.elevation == pytest.approx(math.pi / 2 - 0.01)
        cam.rotate(0.0, -20.0)
        assert cam.elevation == pytest.approx(-(math.pi / 2 - 0.01))

    def test_zoom_clamp(self):
        cam = Camera()
        cam.zoom(100.0)
        assert cam.distance == 20.0  # src/Camera.ts:57
        cam.zoom(-100.0)
        assert cam.distance == 0.5

    def test_pan_moves_target_in_camera_plane(self):
        cam = Camera(azimuth=0.0, elevation=0.0, distance=3.0)
        # looking down -z: camera right = -x? forward=(0,0,-1), right = f x up = (0,0,-1)x(0,1,0) = (1,0,... )
        cam.pan(1.0, 0.0)
        # target moved perpendicular to the view direction
        assert abs(cam.target[2]) < 1e-6
        assert np.linalg.norm(cam.target) == pytest.approx(1.0, abs=1e-5)

    def test_perspective_aspect(self):
        m = perspective(math.radians(45), 2.0, 0.1, 100.0)
        assert m[0, 0] == pytest.approx(m[1, 1] / 2.0)

    def test_look_at_forward_is_minus_z(self):
        v = look_at(
            np.array([0, 0, 5.0], np.float32),
            np.array([0, 0, 0.0], np.float32),
            np.array([0, 1, 0.0], np.float32),
        )
        p = v @ np.array([0, 0, 0, 1.0], np.float32)
        np.testing.assert_allclose(p[:3], [0, 0, -5.0], atol=1e-6)


class TestController:
    def test_rotate_speed(self):
        cam = Camera()
        az0 = cam.azimuth
        OrbitCameraController(cam).drag_rotate(100.0, 0.0)
        assert cam.azimuth == pytest.approx(az0 - 0.5)

    def test_zoom_scales_with_distance(self):
        cam = Camera(distance=10.0)
        OrbitCameraController(cam).wheel_zoom(100.0)
        assert cam.distance == pytest.approx(11.0)


class TestOrbitRing:
    def test_shapes_and_distinctness(self):
        arrs = orbit_ring(8, aspect=16 / 9)
        assert arrs["view_proj"].shape == (8, 4, 4)
        assert arrs["cam_pos"].shape == (8, 3)
        # all views distinct
        assert len({tuple(np.round(p, 5)) for p in arrs["cam_pos"]}) == 8
        # all at the requested distance
        np.testing.assert_allclose(np.linalg.norm(arrs["cam_pos"], axis=1), 3.0, atol=1e-5)


class TestTracedCamera:
    """orbit_camera_arrays (jnp, differentiable) vs Camera.arrays (numpy)."""

    def test_matches_numpy_camera(self):
        from splat_renderer_tpu.camera import orbit_camera_arrays

        cam = Camera(azimuth=0.7, elevation=-0.3, distance=4.5,
                     target=np.array([0.2, -0.1, 0.3], np.float32),
                     fov_deg=45.0, aspect=16 / 9)
        want = cam.arrays(time=1.5)
        pose = {"azimuth": 0.7, "elevation": -0.3, "distance": 4.5,
                "target": np.array([0.2, -0.1, 0.3], np.float32)}
        got = orbit_camera_arrays(pose, fov_deg=45.0, aspect=16 / 9, time=1.5)
        np.testing.assert_allclose(np.asarray(got["view_proj"]),
                                   want["view_proj"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(got["cam_pos"]),
                                   want["cam_pos"], atol=2e-6)
        assert float(got["time"]) == 1.5

    def test_gradients_flow_to_pose(self):
        import jax
        import jax.numpy as jnp

        from splat_renderer_tpu.camera import orbit_camera_arrays

        pose = {"azimuth": jnp.float32(0.5), "elevation": jnp.float32(0.2),
                "distance": jnp.float32(3.0),
                "target": jnp.zeros(3, jnp.float32)}

        def f(pose):
            return jnp.sum(orbit_camera_arrays(pose)["view_proj"] ** 2)

        g = jax.grad(f)(pose)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in g.values())
        assert float(jnp.abs(g["azimuth"])) > 0.0
