from .sharding import (
    make_mesh,
    multichip_frame_fn,
    render_band,
    render_views_data_parallel,
)

__all__ = [
    "make_mesh",
    "multichip_frame_fn",
    "render_band",
    "render_views_data_parallel",
]
