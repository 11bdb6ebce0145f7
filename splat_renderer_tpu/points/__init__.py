from .curvature import curvature_probe
from .projection import project_step, project_to_surface
from .properties import (
    Splats,
    default_splats,
    derive_splats,
    num_splats,
    splat_colors,
    splat_normals,
    splat_positions,
    splats_from_aos,
)
from .seeding import point_count, seed_points, seed_scene_points

__all__ = [
    "Splats",
    "curvature_probe",
    "default_splats",
    "derive_splats",
    "num_splats",
    "point_count",
    "project_step",
    "project_to_surface",
    "seed_points",
    "seed_scene_points",
    "splat_colors",
    "splat_normals",
    "splat_positions",
    "splats_from_aos",
]
