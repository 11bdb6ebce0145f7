from .band import band_frame_fn, depth_band
from .sharding import (
    make_mesh,
    multichip_frame_fn,
    render_band,
    render_views_data_parallel,
)

__all__ = [
    "band_frame_fn",
    "depth_band",
    "make_mesh",
    "multichip_frame_fn",
    "render_band",
    "render_views_data_parallel",
]
