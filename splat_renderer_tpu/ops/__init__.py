from .tile_blend import pallas_blend_tiles, render_tiles_pallas

__all__ = ["pallas_blend_tiles", "render_tiles_pallas"]
