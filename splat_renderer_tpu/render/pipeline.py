"""End-to-end frame functions: scene -> points -> splats -> image.

Counterpart of the reference's frame drivers: the live modeler loop
(src/main.ts:110-193, 7 queue submits per frame) and the intended GPU splat
chain (SURVEY.md section 3.3).  Here the whole frame is ONE jitted XLA
program — seeding, descent, curvature, projection, sort, binning and
compositing all fuse; there is no per-stage submission and no readback.

`Engine` wraps the jit cache, keyed on the scene structure hash: parameter
animation reuses the compiled program (src/GradientSampler.ts:108-133's
rebuild-on-hash-change, without the 10-100 ms WGSL recompile for parameter
changes).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import PointConfig, RenderConfig
from ..points import (
    curvature_probe,
    derive_splats,
    point_count,
    project_to_surface,
    seed_scene_points,
)
from ..points.properties import Splats
from ..sdf.scene import Params, SDFScene
from .binning import bin_splats, depth_sort
from .compositor import render_tiles
from .oracle import render_oracle
from .projector import pack_splat_screen_data, project_splats

CameraArrays = Dict[str, jnp.ndarray]


def model_points(
    scene: SDFScene,
    params: Params,
    key: jax.Array,
    n: int,
    pcfg: PointConfig,
    rcfg: RenderConfig,
) -> Splats:
    """The modeler stage: seed -> k-step projection -> curvature -> splats
    (the reference's per-frame SDF path, src/main.ts:146-180)."""
    pts = seed_scene_points(key, scene, params, n, pcfg)
    pts = project_to_surface(scene, params, pts, pcfg.descent_steps)
    normals, scales = curvature_probe(scene, params, pts, pcfg)
    return derive_splats(pts, normals, scales, rcfg)


def splat_screen_data(
    splats: Splats, camera: CameraArrays, rcfg: RenderConfig
) -> jnp.ndarray:
    """Project + light + pack into the (N, 8) render record (depth-unsorted)."""
    proj = project_splats(
        camera["view_proj"], camera["cam_pos"], splats["position"], splats["radius"], rcfg
    )
    return pack_splat_screen_data(
        proj,
        splats["color"],
        splats["opacity"],
        splats["normal"],
        rcfg,
        view_proj=camera["view_proj"],
        cam_pos=camera["cam_pos"],
        positions=splats["position"],
        radii=splats["radius"],
    )


def on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def render_splats(
    splats: Splats,
    camera: CameraArrays,
    rcfg: RenderConfig,
    compositor: str = "auto",
    blend_block: int = 128,
) -> jnp.ndarray:
    """Splat chain: project -> depth sort -> bin -> composite -> (H, W, 3).

    compositor:
      - "auto": Pallas streaming kernel on TPU, XLA scan compositor elsewhere
      - "pallas" / "tiles": force one of the above
      - "oracle": exact sequential compositor (fidelity ground truth)
    """
    data = splat_screen_data(splats, camera, rcfg)
    if compositor == "oracle":
        return render_oracle(data, rcfg)
    if compositor == "auto":
        compositor = "pallas" if on_tpu() else "tiles"
    if compositor == "pallas":
        from ..ops.tile_blend import render_tiles_pallas

        # no separate depth sort: bin_splats_packed folds depth into the
        # pair sort's secondary key
        return render_tiles_pallas(data, None, rcfg, block=blend_block)
    _, _, data_sorted = depth_sort(data[:, 7], data)
    binned = bin_splats(data_sorted, rcfg)
    return render_tiles(data_sorted, binned, rcfg)


def render_frame(
    scene: SDFScene,
    params: Params,
    camera: CameraArrays,
    key: jax.Array,
    n: int,
    pcfg: PointConfig,
    rcfg: RenderConfig,
    compositor: str = "auto",
) -> jnp.ndarray:
    """Full frame: modeler + splat chain, one XLA program."""
    splats = model_points(scene, params, key, n, pcfg, rcfg)
    return render_splats(splats, camera, rcfg, compositor)


class Engine:
    """Jitted-frame cache with structure-hash keying.

    Usage:
        eng = Engine(scene, pcfg, rcfg)
        img = eng.frame(camera.arrays(t), jax.random.PRNGKey(i))
        scene["sphere1"].position[0] = 0.3   # animate freely
        img = eng.frame(...)                 # no recompile
        scene.set_root(new_tree)             # structure change
        img = eng.frame(...)                 # retrace happens here
    """

    def __init__(
        self,
        scene: SDFScene,
        pcfg: PointConfig = PointConfig(),
        rcfg: RenderConfig = RenderConfig(),
        n: Optional[int] = None,
        compositor: str = "auto",
    ):
        self.scene = scene
        self.pcfg = pcfg
        self.rcfg = rcfg
        self.compositor = compositor
        self._n = n
        self._cache: Dict[str, Callable] = {}

    @property
    def n(self) -> int:
        return self._n if self._n is not None else point_count(self.scene, self.pcfg)

    def _fn(self) -> Callable:
        h = self.scene.structure_hash()
        fn = self._cache.get(h)
        if fn is None:
            from ..utils.log import log_rebuild

            log_rebuild(h)
            scene, n, pcfg, rcfg, comp = (
                self.scene, self.n, self.pcfg, self.rcfg, self.compositor,
            )

            @jax.jit
            def frame(params, camera, key):
                return render_frame(scene, params, camera, key, n, pcfg, rcfg, comp)

            fn = frame
            self._cache[h] = fn
        return fn

    def frame(self, camera: CameraArrays, key: jax.Array) -> jnp.ndarray:
        return self._fn()(self.scene.params(), camera, key)
