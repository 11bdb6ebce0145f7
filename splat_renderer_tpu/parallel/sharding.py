"""Multi-chip sharding: view-DP x point/tile-SP over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY.md section 2.5: no workers, no
NCCL/MPI, nothing to port).  Scaling beyond one chip is therefore pure
TPU-native design, per the BASELINE.json north star:

- **dp (view parallel)**: batched cameras sharded across mesh axis "dp";
  each group renders its views independently.  Exact, zero communication —
  the production multi-view datagen mode (BASELINE.json config 5).
- **sp (space parallel)**: within a dp group,
  * the modeler stage shards *points* (seeding/descent/curvature are
    elementwise — embarrassingly parallel),
  * splat data is then all-gathered over ICI (32 B/splat — cheap), and
  * the compositor stage shards *screen tile bands*: each device renders a
    horizontal strip of the image.  Shifting splat centers into the band's
    frame lets the single-device binning/compositing code run unchanged on a
    band-local RenderConfig; results are exact (every splat is evaluated by
    whichever device owns the tiles it touches).

The only collective is one all_gather of packed splat data per frame; the
image stays sharded (band axis) on device — matching the "keep host transfers
off the critical path" rule.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PointConfig, RenderConfig
from ..points import curvature_probe, derive_splats, project_to_surface, seed_scene_points
from ..sdf.scene import Params, SDFScene
from ..render.binning import bin_splats, canonical_sort_data
from ..render.compositor import render_tiles
from ..render.pipeline import CameraArrays, splat_screen_data


def make_mesh(
    dp: int = 1, sp: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Build a (dp, sp) device mesh.  dp shards views, sp shards points (in
    the modeler) and image tile bands (in the compositor)."""
    devices = devices if devices is not None else jax.devices()
    n = dp * sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def _band_cfg(rcfg: RenderConfig, sp: int) -> RenderConfig:
    """Per-device RenderConfig covering a horizontal band of tiles."""
    if rcfg.tiles_y % sp:
        raise ValueError(
            f"tiles_y={rcfg.tiles_y} must be divisible by sp={sp} "
            f"(pad height to a multiple of {sp * rcfg.tile_h})"
        )
    return rcfg.replace(height=rcfg.tiles_y // sp * rcfg.tile_h)


def render_band(
    data: jnp.ndarray,  # (N, 10) packed screen data, replicated
    band_index: jnp.ndarray,  # scalar int: which horizontal band this device owns
    band_cfg: RenderConfig,
    compositor: str = "tiles",
) -> jnp.ndarray:
    """Render one horizontal image band: shift splats into the band frame and
    run the ordinary single-device tile chain (Pallas on real TPU meshes,
    the XLA compositor on the CPU dryrun mesh)."""
    y0 = band_index.astype(jnp.float32) * band_cfg.height
    data = data.at[:, 1].add(-y0)
    if compositor == "pallas":
        from ..ops.tile_blend import render_tiles_pallas

        return render_tiles_pallas(data, None, band_cfg)
    data_sorted = canonical_sort_data(data, band_cfg)
    binned = bin_splats(data_sorted, band_cfg)
    return render_tiles(data_sorted, binned, band_cfg)


def multichip_frame_fn(
    scene: SDFScene,
    mesh: Mesh,
    n: int,
    pcfg: PointConfig,
    rcfg: RenderConfig,
    compositor: str = "auto",
):
    """Build the jittable multi-chip frame step.

    Returns fn(params, cameras, key) -> (V, H, W, 3) where
      - cameras leaves have a leading view axis V (sharded over "dp"),
      - the modeler shards n points over all dp*sp devices,
      - splats are all-gathered, and
      - each device composites its ("sp"-sharded) tile band for its
        ("dp"-sharded) views.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    n_dev = dp * sp
    if n % n_dev:
        raise ValueError(f"point count {n} must be divisible by {n_dev}")
    n_local = n // n_dev
    band_cfg = _band_cfg(rcfg, sp)
    if compositor == "auto":
        from ..render.pipeline import on_tpu

        compositor = "pallas" if on_tpu() else "tiles"

    def local_step(params: Params, cameras: CameraArrays, key: jax.Array):
        # ---- modeler: points sharded over the whole mesh ----
        dev_id = jax.lax.axis_index("dp") * sp + jax.lax.axis_index("sp")
        k = jax.random.fold_in(key, dev_id)
        pts = seed_scene_points(k, scene, params, n_local, pcfg)
        pts = project_to_surface(scene, params, pts, pcfg.descent_steps)
        normals, scales = curvature_probe(scene, params, pts, pcfg)
        splats = derive_splats(pts, normals, scales, rcfg)

        # ---- gather the full splat set (one ICI all_gather per frame) ----
        splats = jax.tree.map(
            lambda x: jax.lax.all_gather(
                jax.lax.all_gather(x, "sp", axis=0, tiled=True),
                "dp", axis=0, tiled=True,
            ),
            splats,
        )

        # ---- render: views over dp, tile bands over sp ----
        band = jax.lax.axis_index("sp")

        def one_view(camera: CameraArrays) -> jnp.ndarray:
            data = splat_screen_data(splats, camera, rcfg)
            return render_band(data, band, band_cfg, compositor)

        return jax.vmap(one_view)(cameras)  # (V_local, H/sp, W, 3)

    shard_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("dp"), P()),
        out_specs=P("dp", "sp", None, None),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def render_views_data_parallel(
    splats_data: jnp.ndarray,  # (V, N, 8) per-view packed screen data
    mesh: Mesh,
    rcfg: RenderConfig,
) -> jnp.ndarray:
    """Pure view-DP compositing of pre-packed per-view splat data: shard the
    view axis over every mesh device, no communication."""
    flat_devices = mesh.devices.reshape(-1)
    vmesh = Mesh(flat_devices, ("v",))

    def one(data):
        ds = canonical_sort_data(data, rcfg)
        return render_tiles(ds, bin_splats(ds, rcfg), rcfg)

    fn = jax.shard_map(
        jax.vmap(one), mesh=vmesh, in_specs=P("v"), out_specs=P("v"),
        check_vma=False,
    )
    return jax.jit(fn)(splats_data)
