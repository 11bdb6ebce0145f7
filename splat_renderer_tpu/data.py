"""Dataset IO: load multi-view training data from disk for inverse rendering.

The missing half of the datagen loop: `datagen.py` writes PNGs + a
manifest.json (camera matrices per frame, optional 16-bit depth / alpha
G-buffer channels); this loads them back as the (cameras, targets) pairs
`fit.fit_splats` / `fit_splats_dp` consume — train a splat scene from files,
not just from in-memory renders.  The WebGPU reference has no dataset IO of
any kind (its pipeline is forward-only to a canvas); this is the data-loader
tier a production training framework needs.

Layout (datagen.py's output):
    <dir>/manifest.json        {"frames": [...], "width", "height", "fov_deg"}
    <dir>/stepNNN_viewVV.png   8-bit RGB target
    <dir>/..._depth.png        16-bit grayscale, per-frame affine in manifest
    <dir>/..._alpha.png        16-bit grayscale coverage

PNG decode is stdlib-only (utils/image.read_png) and threaded across frames
(zlib releases the GIL).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .utils.image import load_image, read_png


def load_dataset(
    path: str,
    step: Optional[int] = None,
    gbuffer: bool = False,
    max_workers: int = 8,
) -> Dict:
    """Load a datagen-produced dataset directory.

    step: keep only frames of that animation step (None = all — fine for
    static scenes; animated datasets should fit one step's geometry at a
    time).  gbuffer=True also loads depth (denormalized to metric camera
    distance via the manifest's per-frame affine; 0 where alpha ~ 0) and
    alpha channels when the manifest has them.

    Returns {"cameras": [ {view_proj (4,4), cam_pos (3,)} ... ],
             "images": [ (H, W, 3) f32 ... ],
             "depth": [ (H, W) f32 ... ] | None,
             "alpha": [ (H, W) f32 ... ] | None,
             "width", "height", "fov_deg", "frames" (manifest rows)} —
    cameras/images are parallel lists in manifest order, ready for
    fit_splats(cameras=..., targets=...); stack_views() turns them into the
    stacked (V, ...) form fit_splats_dp / render_views use.
    """
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    frames = manifest["frames"]
    if step is not None:
        frames = [fr for fr in frames if fr.get("step") == step]
    if not frames:
        raise ValueError(f"{path}: no frames" + (f" for step {step}" if step
                                                 is not None else ""))
    want_gb = gbuffer and all("depth_file" in fr for fr in frames)
    if gbuffer and not want_gb:
        raise ValueError(
            f"{path}: gbuffer=True but the manifest has no depth channels "
            "(generate with datagen.py --gbuffer)"
        )

    def one(fr):
        img = load_image(os.path.join(path, fr["file"]))
        if not want_gb:
            return img, None, None
        alpha = read_png(os.path.join(path, fr["alpha_file"])).astype(
            np.float32
        ) / np.float32(65535.0)
        dn = read_png(os.path.join(path, fr["depth_file"])).astype(
            np.float32
        ) / np.float32(65535.0)
        lo, hi = fr["depth_min"], fr["depth_max"]
        depth = np.where(alpha > 1e-6, dn * (hi - lo) + lo, 0.0).astype(
            np.float32
        )
        return img, depth, alpha

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        loaded = list(pool.map(one, frames))

    cameras = [
        {
            "view_proj": jnp.asarray(fr["view_proj"], jnp.float32),
            "cam_pos": jnp.asarray(fr["cam_pos"], jnp.float32),
        }
        for fr in frames
    ]
    return {
        "cameras": cameras,
        "images": [jnp.asarray(im) for im, _, _ in loaded],
        "depth": [jnp.asarray(d) for _, d, _ in loaded] if want_gb else None,
        "alpha": [jnp.asarray(a) for _, _, a in loaded] if want_gb else None,
        "width": manifest["width"],
        "height": manifest["height"],
        "fov_deg": manifest.get("fov_deg", 45.0),
        "frames": frames,
    }


def stack_views(dataset: Dict):
    """(cameras, targets) in the stacked (V, ...) layout of render_views /
    fit_splats_dp: cameras a pytree with a leading view axis, targets
    (V, H, W, 3)."""
    cams: List[Dict] = dataset["cameras"]
    cameras = {
        k: jnp.stack([c[k] for c in cams]) for k in cams[0]
    }
    targets = jnp.stack(dataset["images"])
    return cameras, targets
