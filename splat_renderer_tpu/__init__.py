"""splat_renderer_tpu — a TPU-native rebuild of ath92/splat-renderer.

A Gaussian-splat modeling + rendering engine in JAX/XLA/Pallas:

- `sdf`:      CSG scene graph of SDF primitives with analytic gradients;
              tracing+jit replaces the reference's WGSL code generator.
- `points`:   device-side surface-point seeding, gradient-descent projection
              (lax.scan), curvature probe, splat property derivation.
- `render`:   splat projection, sort-based tile binning (no atomics),
              per-tile front-to-back compositing, and an exact sequential
              oracle.
- `ops`:      Pallas TPU kernels for the hot paths (tile blend, radix sort).
- `parallel`: multi-chip sharding (view-DP x tile-TP x point-SP) over a
              jax.sharding.Mesh.
- `fit`:      inverse rendering — 3DGS-style gradient-descent fitting of
              splat fields to target images (render/diff.py + a custom-VJP
              Pallas kernel pair); the reference is forward-only.

Reference: /root/reference (TypeScript + WGSL, WebGPU).  This is a from-
scratch TPU-first design, not a port; docstrings cite reference file:line for
behavior parity only.
"""

from . import sdf
from .camera import (
    Camera,
    OrbitCameraController,
    orbit_camera_arrays,
    orbit_ring,
)
from .config import (PointConfig, RenderConfig, surface_render_config,
                     turbo_render_config)
from .sdf import (
    Box,
    Capsule,
    Cylinder,
    Ellipsoid,
    RoundBox,
    SDFScene,
    Sphere,
    Torus,
    intersection,
    smooth_intersection,
    smooth_subtraction,
    smooth_union,
    subtraction,
    union,
)

__version__ = "0.1.0"

__all__ = [
    "Box",
    "Camera",
    "Capsule",
    "Cylinder",
    "Ellipsoid",
    "RoundBox",
    "smooth_intersection",
    "smooth_subtraction",
    "OrbitCameraController",
    "PointConfig",
    "RenderConfig",
    "surface_render_config",
    "turbo_render_config",
    "SDFScene",
    "Sphere",
    "Torus",
    "intersection",
    "orbit_camera_arrays",
    "orbit_ring",
    "sdf",
    "smooth_union",
    "subtraction",
    "union",
]

from .data import (  # noqa: E402
    backproject_gbuffer,
    load_dataset,
    load_transforms,
    stack_views,
)

__all__ += ["backproject_gbuffer", "load_dataset", "load_transforms",
            "stack_views"]
