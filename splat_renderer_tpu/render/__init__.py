from .binning import (
    bin_splats,
    bin_splats_stream,
    canonical_sort_data,
    depth_sort,
    depth_sort_data,
)
from .blend import (
    composite_over_background,
    over_merge,
    segmented_exclusive_product,
    splat_alpha,
)
from .compositor import render_tiles, tiles_to_image, tiles_to_plane
from .diff import render_diff, render_diff_gbuffer, splat_screen_records_diff
from .oracle import pixel_grid, render_oracle
from .pipeline import (
    Engine,
    SplatEngine,
    model_points,
    render_frame,
    render_gbuffer,
    render_splats,
    splat_screen_data,
)
from .sh import apply_sh, sh_basis_planes, sh_degree
from .projector import (
    project_planes,
    project_splats,
    screen_planes,
    shade_planes,
    splat_screen_records,
    splat_screen_words,
)

__all__ = [
    "Engine",
    "SplatEngine",
    "bin_splats",
    "composite_over_background",
    "depth_sort",
    "model_points",
    "over_merge",
    "pixel_grid",
    "project_planes",
    "project_splats",
    "screen_planes",
    "splat_screen_records",
    "splat_screen_words",
    "render_diff",
    "render_diff_gbuffer",
    "render_frame",
    "render_gbuffer",
    "tiles_to_plane",
    "render_oracle",
    "render_splats",
    "render_tiles",
    "shade_planes",
    "splat_screen_records_diff",
    "segmented_exclusive_product",
    "splat_alpha",
    "splat_screen_data",
    "tiles_to_image",
    "apply_sh",
    "sh_basis_planes",
    "sh_degree",
]
from .multiview import render_views, render_views_gbuffer  # noqa: E402

__all__ += ["render_views", "render_views_gbuffer"]
from .sequence import render_sequence  # noqa: E402

__all__.append("render_sequence")
