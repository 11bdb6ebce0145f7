from .serve import serve
from .turntable import render_turntable

__all__ = ["render_turntable", "serve"]
