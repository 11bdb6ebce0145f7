from .serve import make_server, serve
from .turntable import render_turntable

__all__ = ["make_server", "render_turntable", "serve"]
