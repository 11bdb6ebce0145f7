from .image import to_uint8, write_png
from .timing import StageTimer, time_fn

__all__ = ["StageTimer", "time_fn", "to_uint8", "write_png"]
from .snapshot import (  # noqa: E402
    load_pytree,
    load_splats,
    save_pytree,
    save_splats,
)

__all__ += ["load_pytree", "load_splats", "save_pytree", "save_splats"]
from .ply import load_ply, save_ply  # noqa: E402

__all__ += ["load_ply", "save_ply"]
from .log import log_point_budget, log_rebuild, logger  # noqa: E402
from .profiling import annotate, trace  # noqa: E402

__all__ += ["annotate", "log_point_budget", "log_rebuild", "logger", "trace"]
