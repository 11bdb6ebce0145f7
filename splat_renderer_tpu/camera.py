"""Orbit camera and projection math.

Counterpart of src/Camera.ts (orbit parameters, lazy view-projection via
gl-matrix) and src/OrbitCameraController.ts (input-delta mapping).  Host-side
math is plain numpy; `camera_arrays()` snapshots the matrices into the small
pytree consumed by jitted render functions — the analogue of the reference's
80-byte frame uniform {mat4 viewProj, vec3 cameraPos, f32 time}
(src/main.ts:46-51,126-144).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import numpy as np


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Right-handed view matrix, gl-matrix `mat4.lookAt` semantics
    (used at src/Camera.ts:104-109)."""
    eye = np.asarray(eye, np.float32)
    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective(fov_y_rad: float, aspect: float, near: float, far: float) -> np.ndarray:
    """GL-style perspective (clip z in [-1, 1]), gl-matrix `mat4.perspective`
    semantics (src/Camera.ts:112-118).  Only NDC x/y matter downstream — depth
    sorting uses camera-space distance (src/SplatProjector.ts:77)."""
    f = 1.0 / math.tan(fov_y_rad / 2.0)
    nf = 1.0 / (near - far)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) * nf
    m[2, 3] = 2.0 * far * near * nf
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass
class Camera:
    """Orbit camera: target/distance/azimuth/elevation (src/Camera.ts:23-37)."""

    target: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    distance: float = 3.0
    azimuth: float = 0.5
    elevation: float = 0.5
    fov_deg: float = 45.0
    aspect: float = 1.0
    near: float = 0.1
    far: float = 100.0

    # interaction clamps (src/Camera.ts:49-57)
    MAX_ELEVATION = math.pi / 2 - 0.01
    MIN_DISTANCE = 0.5
    MAX_DISTANCE = 20.0

    def set_aspect(self, aspect: float) -> None:
        self.aspect = float(aspect)

    def rotate(self, d_azimuth: float, d_elevation: float) -> None:
        self.azimuth += d_azimuth
        self.elevation = float(
            np.clip(self.elevation + d_elevation, -self.MAX_ELEVATION, self.MAX_ELEVATION)
        )

    def zoom(self, d_distance: float) -> None:
        self.distance = float(
            np.clip(self.distance + d_distance, self.MIN_DISTANCE, self.MAX_DISTANCE)
        )

    def pan(self, dx: float, dy: float) -> None:
        """Translate the orbit target in the camera plane (src/Camera.ts:61-83)."""
        forward = self.target - self.position()
        forward = forward / np.linalg.norm(forward)
        right = np.cross(forward, np.array([0.0, 1.0, 0.0], np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(right, forward)
        up = up / np.linalg.norm(up)
        self.target = (self.target + right * dx + up * dy).astype(np.float32)

    def position(self) -> np.ndarray:
        """Eye position from spherical orbit params (src/Camera.ts:85-95)."""
        ce = math.cos(self.elevation)
        x = self.distance * ce * math.sin(self.azimuth)
        y = self.distance * math.sin(self.elevation)
        z = self.distance * ce * math.cos(self.azimuth)
        return (self.target + np.array([x, y, z], np.float32)).astype(np.float32)

    def view_matrix(self) -> np.ndarray:
        return look_at(self.position(), self.target, np.array([0, 1, 0], np.float32))

    def projection_matrix(self) -> np.ndarray:
        return perspective(
            math.radians(self.fov_deg), self.aspect, self.near, self.far
        )

    def view_projection_matrix(self) -> np.ndarray:
        return (self.projection_matrix() @ self.view_matrix()).astype(np.float32)

    def arrays(self, time: float = 0.0) -> Dict[str, np.ndarray]:
        """Frame-uniform pytree: {view_proj (4,4), cam_pos (3,), time ()}."""
        return {
            "view_proj": self.view_projection_matrix(),
            "cam_pos": self.position(),
            "time": np.float32(time),
        }


def orbit_camera_arrays(
    pose: Dict,
    fov_deg: float = 45.0,
    aspect: float = 1.0,
    near: float = 0.1,
    far: float = 100.0,
    time: float = 0.0,
):
    """Differentiable (jnp) counterpart of `Camera.arrays()`.

    `pose` is a pytree of traced scalars/vectors —
    {"azimuth": (), "elevation": (), "distance": (), "target": (3,)} —
    so `jax.grad` flows from an image loss back to the camera pose
    (fit.fit_camera): pose registration by inverse rendering, the third leg
    after splat fields and SDF scene params.  fov/aspect/near/far stay
    static (they are RenderConfig-class quantities, not pose).

    Matches Camera.arrays() to fp32 for equal parameters
    (tests/test_camera.py::TestTracedCamera).
    """
    import jax
    import jax.numpy as jnp

    hi = jax.lax.Precision.HIGHEST  # CLAUDE.md: f32 dots default to bf16 MXU

    az = jnp.asarray(pose["azimuth"], jnp.float32)
    el = jnp.asarray(pose["elevation"], jnp.float32)
    d = jnp.asarray(pose["distance"], jnp.float32)
    target = jnp.asarray(pose["target"], jnp.float32)
    ce = jnp.cos(el)
    eye = target + d * jnp.stack(
        [ce * jnp.sin(az), jnp.sin(el), ce * jnp.cos(az)]
    )
    # look_at (gl-matrix semantics, same as the numpy path above)
    f = target - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    view = jnp.stack([
        jnp.concatenate([s, -jnp.dot(s, eye, precision=hi)[None]]),
        jnp.concatenate([u, -jnp.dot(u, eye, precision=hi)[None]]),
        jnp.concatenate([-f, jnp.dot(f, eye, precision=hi)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
    ])
    proj = jnp.asarray(
        perspective(math.radians(fov_deg), aspect, near, far)
    )
    return {
        "view_proj": jnp.dot(proj, view, precision=hi).astype(jnp.float32),
        "cam_pos": eye.astype(jnp.float32),
        "time": jnp.float32(time),
    }


class OrbitCameraController:
    """Input-delta → camera-parameter mapping (src/OrbitCameraController.ts).

    Event-source-agnostic: feed it mouse deltas from any front end.  Speeds
    match src/OrbitCameraController.ts:12-14.
    """

    ROTATE_SPEED = 0.005
    PAN_SPEED = 0.002
    ZOOM_SPEED = 0.001

    def __init__(self, camera: Camera):
        self.camera = camera

    def drag_rotate(self, dx_px: float, dy_px: float) -> None:
        self.camera.rotate(-dx_px * self.ROTATE_SPEED, dy_px * self.ROTATE_SPEED)

    def drag_pan(self, dx_px: float, dy_px: float) -> None:
        self.camera.pan(-dx_px * self.PAN_SPEED, dy_px * self.PAN_SPEED)

    def wheel_zoom(self, delta: float) -> None:
        self.camera.zoom(delta * self.ZOOM_SPEED * self.camera.distance)


def orbit_ring(
    n_views: int, distance: float = 3.0, elevation: float = 0.5, aspect: float = 1.0
) -> Dict[str, np.ndarray]:
    """Batched camera arrays for n views on an orbit ring — the multi-view
    datagen front end (BASELINE.json config 5).  Returns stacked arrays with a
    leading view axis, ready for vmap/sharding."""
    vps, poss, times = [], [], []
    for i in range(n_views):
        cam = Camera(azimuth=2 * math.pi * i / n_views, elevation=elevation,
                     distance=distance, aspect=aspect)
        a = cam.arrays(0.0)
        vps.append(a["view_proj"])
        poss.append(a["cam_pos"])
        times.append(a["time"])
    return {
        "view_proj": np.stack(vps),
        "cam_pos": np.stack(poss),
        "time": np.stack(times),
    }
