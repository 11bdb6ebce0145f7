"""Minimal dependency-free PNG writer for frame output.

The reference presents to a canvas; our app layer ships frames off-device
(SURVEY.md section 7 "Interactivity without a canvas").  This writes
fp32 [0,1] images as 8-bit RGB PNGs using only the stdlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(img) -> np.ndarray:
    arr = np.asarray(img)
    # in-place pipeline: one allocation instead of four (63 -> ~30 ms @1080p)
    x = arr * np.float32(255.0)
    x += np.float32(0.5)
    np.nan_to_num(x, copy=False)
    np.clip(x, 0, 255, out=x)
    return x.astype(np.uint8)


def unflatten_rows(arr, width: int) -> np.ndarray:
    """(..., H, W*3) flat interleaved raster rows -> (..., H, W, 3).

    Host-side inverse of the `flat=True` output layout of render_sequence /
    render_views (a trailing dim of 3 is lane-padded 3->128 in TPU HBM — a
    42x allocation tax — so fused programs emit flat rows instead)."""
    a = np.asarray(arr)
    return a.reshape(a.shape[:-1] + (width, 3))


def write_png(path: str, img, fast: bool = True) -> None:
    """img: (H, W, 3) float [0,1] or uint8.

    fast=True (default) uses PNG filter 1 (Sub) with a vectorized diff and
    zlib level 1 — measured 238 -> ~25 ms at 1080p (the per-row Python
    loop + level-6 deflate dominated; Sub-filtered natural images compress
    fine at level 1).  fast=False keeps filter 0 + level 6 for marginally
    smaller files.
    """
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)

    flat = arr.reshape(h, w * 3)
    if fast:
        # filter 1 (Sub): delta against the previous PIXEL's byte — turns
        # smooth gradients into near-zero runs that fast deflate eats
        sub = flat.copy()
        sub[:, 3:] = flat[:, 3:] - flat[:, :-3]
        rows = np.concatenate(
            [np.full((h, 1), 1, np.uint8), sub], axis=1
        )
        level = 1
    else:
        rows = np.concatenate(
            [np.zeros((h, 1), np.uint8), flat], axis=1
        )
        level = 6
    raw = rows.tobytes()
    _write_png_chunks(path, w, h, bit_depth=8, color_type=2, raw=raw,
                      level=level)


def _write_png_chunks(
    path: str, w: int, h: int, bit_depth: int, color_type: int,
    raw: bytes, level: int,
) -> None:
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_png16(path: str, img) -> None:
    """img: (H, W) uint16, or float in [0, 1] (scaled to the full u16
    range).  16-bit grayscale PNG — the standard lossless container for
    depth maps (datagen's G-buffer depth channel).  Filter 0 + deflate
    level 1: depth rasters are piecewise-smooth, Sub filtering on the
    big-endian byte stream would split each sample across two deltas for
    no gain."""
    arr = np.asarray(img)
    if arr.dtype != np.uint16:
        x = np.asarray(arr, np.float32) * np.float32(65535.0)
        x += np.float32(0.5)
        np.nan_to_num(x, copy=False)
        np.clip(x, 0, 65535, out=x)
        arr = x.astype(np.uint16)
    h, w = arr.shape
    be = np.ascontiguousarray(arr.astype(">u2")).view(np.uint8).reshape(h, w * 2)
    rows = np.concatenate([np.zeros((h, 1), np.uint8), be], axis=1)
    _write_png_chunks(path, w, h, bit_depth=16, color_type=0,
                      raw=rows.tobytes(), level=1)
