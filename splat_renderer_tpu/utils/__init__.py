from .image import to_uint8, write_png
from .timing import StageTimer, time_fn

__all__ = ["StageTimer", "time_fn", "to_uint8", "write_png"]
