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
    return np.clip(np.nan_to_num(arr) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def unflatten_rows(arr, width: int) -> np.ndarray:
    """(..., H, W*3) flat interleaved raster rows -> (..., H, W, 3).

    Host-side inverse of the `flat=True` output layout of render_sequence /
    render_views (a trailing dim of 3 is lane-padded 3->128 in TPU HBM — a
    42x allocation tax — so fused programs emit flat rows instead)."""
    a = np.asarray(arr)
    return a.reshape(a.shape[:-1] + (width, 3))


def write_png(path: str, img) -> None:
    """img: (H, W, 3) float [0,1] or uint8."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)

    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)
