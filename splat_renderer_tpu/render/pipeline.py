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
from .binning import bin_splats, canonical_sort_data
from .compositor import render_tiles
from .oracle import render_oracle
from .projector import splat_screen_records

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
    """Project + light + pack into the (N, 10) render record (depth-unsorted)."""
    return splat_screen_records(
        splats, camera["view_proj"], camera["cam_pos"], rcfg
    )


def on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def render_splats(
    splats: Splats,
    camera: CameraArrays,
    rcfg: RenderConfig,
    compositor: str = "auto",
    blend_block: int = 1024,
    blend_max_blocks: Optional[int] = None,
    return_stats: bool = False,
    blend_kernel: str = "flat",
    pair_class_caps: Optional[Tuple[int, int]] = None,
    blend_group: int = 256,
    blend_eps: float = -1.0,
    blend_sat_every: int = 2,
):
    """Splat chain: project -> depth sort -> bin -> composite -> (H, W, 3).

    compositor:
      - "auto": Pallas streaming kernel on TPU, XLA scan compositor elsewhere
      - "pallas" / "tiles": force one of the above
      - "oracle": exact sequential compositor (fidelity ground truth)

    blend_kernel (Pallas path): "flat" = grid-per-window, "tile" =
    grid-per-nonempty-tile with manual double-buffered DMA — bit-identical
    images; the tile kernel measures slightly faster in the fused frame and
    much faster in eps=0 parity runs.  NOTE blend_max_blocks is in WINDOW
    units for "flat" and NONEMPTY-TILE units for "tile" (the stats'
    blocks_used follows the same unit, so Engine's growth protocol is
    unit-agnostic).

    blend_max_blocks: static grid-capacity class for the Pallas blend (see
    ops.tile_blend.render_tiles_pallas); with return_stats=True the Pallas
    path returns (image, {"blocks_used", "overflow", "class_counts",
    "class_overflow"}) so callers can run the capacity-growth protocols
    (Engine does this automatically).

    pair_class_caps: (C4, C2) static footprint-class capacities for the
    binner's class-partitioned pair expansion (binning.bin_packed_words) —
    shrinks the pair sort, the frame's wall, toward the true pair count.
    None = safe full-cap expansion.

    blend_group: records per blend PREDICATE group (ops.tile_blend
    _blend_window).  Larger powers of two amortize the per-group scalar
    predicate + saturation sync over several 128-record folds:
    bit-identical to 128 at eps=0, and within a few x transmittance_eps
    at default eps — coarser checkpoints skip FEWER sub-threshold records,
    i.e. strictly closer to the no-early-exit ground truth (device-gated
    in drive_tpu_parity.check_blend_group).  Default 256: measured -1.0 ms
    on the 1M@1080p fused frame, 512 adds nothing
    (benchmarks/probe_group.py, in-process interleaved).  The ops-level
    render_tiles_pallas keeps default 128 so kernel-API continuity metrics
    stay comparable across rounds.

    blend_eps: saturation cutoff for the Pallas path (-1 = use
    cfg.transmittance_eps; 0 disables early exit, for parity runs).

    blend_sat_every: saturation-checkpoint spacing in predicate groups
    (ops.tile_blend sat_every; tuned by benchmarks/probe_sat.py — the
    per-check (1,1) scalar sync trades against the compute it skips).
    """
    if compositor == "auto":
        compositor = "pallas" if on_tpu() else "tiles"
    if compositor == "pallas":
        from ..ops.tile_blend import render_tiles_pallas
        from .binning import bin_packed_words
        from .projector import splat_screen_words

        # SoA fast path: plane projection -> packed u32 words -> rank-keyed
        # pair sort; neither the (N, 10) record array nor any (N, 3)
        # intermediate is ever materialized (lane-padding/relayout costs
        # measured in benchmarks/probe_project.py)
        words = splat_screen_words(
            splats, camera["view_proj"], camera["cam_pos"], rcfg
        )
        binned = bin_packed_words(
            words["dk"], words["w_pos"], words["w_ro"], words["w_rgb"],
            rcfg, blend_block, class_caps=pair_class_caps,
        )
        return render_tiles_pallas(
            None, binned, rcfg, block=blend_block, eps=blend_eps,
            max_blocks=blend_max_blocks, return_stats=return_stats,
            kernel=blend_kernel, group=blend_group,
            sat_every=blend_sat_every,
        )
    data = splat_screen_data(splats, camera, rcfg)
    if compositor == "oracle":
        img = render_oracle(data, rcfg)
        return (img, None) if return_stats else img
    data_sorted = canonical_sort_data(data, rcfg)
    binned = bin_splats(data_sorted, rcfg)
    img = render_tiles(data_sorted, binned, rcfg)
    return (img, None) if return_stats else img


def render_gbuffer(
    splats: Splats,
    camera: CameraArrays,
    rcfg: RenderConfig,
    pair_chunk: int = 1024,
    method: str = "auto",
    blend_block: int = 1024,
    blend_max_blocks: Optional[int] = None,
    eps: float = -1.0,
    interpret: bool = False,
    blend_group: int = 256,
):
    """Render the G-buffer: {"rgb" (H,W,3), "depth" (H,W), "alpha" (H,W)}.

    The datagen channels TPU training pipelines want next to color: `alpha`
    is the composited coverage 1 - transmittance, `depth` the
    alpha-normalized expected splat depth Σ w_i d_i / α (the record's
    camera distance under the same over-blend weights as color; 0 where
    nothing was hit).  The reference's WGSL compositor writes color only
    (src/ComputeShaderRenderer.ts:193-197).

    method="pallas" (the "auto" choice on TPU) runs the exact streaming
    kernel with a depth-carrying pair stream (binning with_depth=True;
    ops/tile_blend.py): the depth value rides the blend's MXU fold as a 4th
    premultiplied channel in the accumulator's spare rows, so bulk RGB-D
    datagen runs at kernel speed instead of the ~8-10x-slower XLA scan
    (VERDICT r3 item 3).  method="tiles" keeps the scan compositor — the
    readable reference path the kernel is gated against (tests/test_render).
    eps: saturation cutoff for the kernel path (default cfg.transmittance
    _eps; 0 disables, for exact parity runs).
    """
    if method == "auto":
        method = "pallas" if on_tpu() else "tiles"
    if method == "pallas":
        from ..ops.tile_blend import render_tiles_pallas
        from .binning import bin_packed_words
        from .projector import splat_screen_words

        words = splat_screen_words(
            splats, camera["view_proj"], camera["cam_pos"], rcfg
        )
        binned = bin_packed_words(
            words["dk"], words["w_pos"], words["w_ro"], words["w_rgb"],
            rcfg, blend_block, with_depth=True,
        )
        gb = render_tiles_pallas(
            None, binned, rcfg, block=blend_block, eps=eps,
            max_blocks=blend_max_blocks, kernel="tile", with_depth=True,
            interpret=interpret, group=blend_group,
        )
        alpha = gb["alpha"]
        depth = jnp.where(
            alpha > 1e-6, gb["depth"] / jnp.maximum(alpha, 1e-6), 0.0
        )
        return {"rgb": gb["rgb"], "depth": depth, "alpha": alpha}
    data = splat_screen_data(splats, camera, rcfg)
    data_sorted = canonical_sort_data(data, rcfg)
    binned = bin_splats(data_sorted, rcfg)
    img, depth_acc, alpha = render_tiles(
        data_sorted, binned, rcfg, pair_chunk, return_aux=True
    )
    depth = jnp.where(alpha > 1e-6, depth_acc / jnp.maximum(alpha, 1e-6), 0.0)
    return {"rgb": img, "depth": depth, "alpha": alpha}


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
    """Jitted-frame cache with structure-hash keying and blend-capacity
    classes.

    Usage:
        eng = Engine(scene, pcfg, rcfg)
        img = eng.frame(camera.arrays(t), jax.random.PRNGKey(i))
        scene["sphere1"].position[0] = 0.3   # animate freely
        img = eng.frame(...)                 # no recompile
        scene.set_root(new_tree)             # structure change
        img = eng.frame(...)                 # retrace happens here

    Capacity classes: the Pallas blend's grid size is static under jit; the
    safe worst-case bound wastes ~0.3 us per unused grid step (~3 ms/frame at
    1M splats).  The first frame per structure runs at the safe bound, then
    the engine re-jits at a 1024-granular class sized to 1.25x the observed
    window count.  If a later frame overflows its class (flagged by
    render_tiles_pallas — affected tiles render empty, never garbage), the
    engine grows the class and re-renders that frame.  The cache is bounded:
    oldest entries are evicted beyond `cache_size` structures.
    """

    CLASS_HEADROOM = 1.25
    # pair-cap headroom is TIGHTER than the blend-capacity headroom: every
    # slack pair slot costs sort payload movement (~1.5-1.9 ms/column per
    # 2.45M rows, NOTES round 5), while a blend-capacity slot costs only
    # ~0.3 us of skipped grid step — and pair-cap overflow has the same
    # safe re-render protocol
    PAIR_CAP_HEADROOM = 1.15

    def __init__(
        self,
        scene: SDFScene,
        pcfg: PointConfig = PointConfig(),
        rcfg: RenderConfig = RenderConfig(),
        n: Optional[int] = None,
        compositor: str = "auto",
        cache_size: int = 8,
        blend_kernel: str = "tile",
        stats_every: int = 1,
    ):
        self.scene = scene
        self.pcfg = pcfg
        self.rcfg = rcfg
        self.compositor = compositor
        self.blend_kernel = blend_kernel
        self.stats_every = stats_every
        self._n = n
        self._frame_i = -1
        self._cache: Dict[Tuple, Callable] = {}
        self._class: Dict[str, Optional[int]] = {}
        self._ccaps: Dict[str, Optional[Tuple[int, int]]] = {}
        self._cache_size = cache_size

    @property
    def n(self) -> int:
        return self._n if self._n is not None else point_count(self.scene, self.pcfg)

    def _uses_pallas(self) -> bool:
        return self.compositor == "pallas" or (
            self.compositor == "auto" and on_tpu()
        )

    def _key(self) -> str:
        """Cache key of the current scene structure (param changes share it)."""
        return self.scene.structure_hash()

    def _args(self, camera: CameraArrays, key: jax.Array) -> Tuple:
        """Positional arguments for the jitted frame built by `_build`."""
        return (self.scene.params(), camera, key)

    def _build(self, mb: Optional[int], cc: Optional[Tuple[int, int]]) -> Callable:
        scene, n, pcfg, rcfg, comp = (
            self.scene, self.n, self.pcfg, self.rcfg, self.compositor,
        )
        bk = self.blend_kernel

        @jax.jit
        def frame(params, camera, key):
            splats = model_points(scene, params, key, n, pcfg, rcfg)
            return render_splats(
                splats, camera, rcfg, comp,
                blend_max_blocks=mb, return_stats=True, blend_kernel=bk,
                pair_class_caps=cc,
            )

        return frame

    def _fn(self, mb: Optional[int], cc: Optional[Tuple[int, int]]) -> Callable:
        h = self._key()
        fn = self._cache.get((h, mb, cc))
        if fn is None:
            from ..utils.log import log_rebuild

            log_rebuild(h)
            fn = self._build(mb, cc)
            while len(self._cache) >= self._cache_size:
                self._cache.pop(next(iter(self._cache)))
            self._cache[(h, mb, cc)] = fn
        return fn

    def _frame_splats(self, camera: CameraArrays, key: jax.Array):
        """The splat planes a frame at this camera/key would render —
        the stage_profile hook (SplatEngine overrides)."""
        return jax.jit(
            lambda p, k: model_points(self.scene, p, k, self.n, self.pcfg,
                                      self.rcfg)
        )(self.scene.params(), key)

    def stage_profile(self, camera: CameraArrays, key: jax.Array,
                      iters: int = 3) -> Dict[str, float]:
        """One-off fused-delta stage timing at this camera (ms) — the
        bench.py method: P1 = project, P2 = project+bin, P3 = full render;
        deltas cancel the fixed dispatch overhead.  Pallas compositor only
        (falls back to {} elsewhere).  Used by the viewer HUD."""
        if not self._uses_pallas():
            return {}
        from ..utils.timing import time_fn
        from .binning import bin_packed_words
        from .projector import splat_screen_words

        rcfg, block = self.rcfg, 1024
        splats = self._frame_splats(camera, key)

        def p1(s, c):
            return splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)

        def p2(s, c):
            w = p1(s, c)
            return bin_packed_words(w["dk"], w["w_pos"], w["w_ro"],
                                    w["w_rgb"], rcfg, block)["pair_w"]

        def p3(s, c):
            return render_splats(s, c, rcfg, "pallas", block,
                                 blend_kernel=self.blend_kernel)

        t1, _ = time_fn(jax.jit(p1), splats, camera, warmup=1, iters=iters)
        t2, _ = time_fn(jax.jit(p2), splats, camera, warmup=1, iters=iters)
        t3, _ = time_fn(jax.jit(p3), splats, camera, warmup=1, iters=iters)
        return {
            "project_ms": round(t1 * 1e3, 2),
            "bin_ms": round(max(t2 - t1, 0.0) * 1e3, 2),
            "blend_ms": round(max(t3 - t2, 0.0) * 1e3, 2),
        }

    def frame(self, camera: CameraArrays, key: jax.Array) -> jnp.ndarray:
        h = self._key()
        mb = self._class.get(h)
        cc = self._ccaps.get(h)
        img, stats = self._fn(mb, cc)(*self._args(camera, key))
        # Reading the stats pytree forces a device->host round trip — a
        # full relay barrier (~26 ms measured) EVERY frame.  stats_every=k
        # checks only every k-th steady-state frame (capacity drifts with
        # camera motion, not per frame).  Degradation while a check is
        # skipped, for < k frames until the next check recovers: blend-
        # capacity overflow renders the affected tiles EMPTY; pair-class
        # overflow renders the SPILLED records with shrunk (center-tile)
        # footprints — visible but bounded artifacts, never garbage
        # values.  Checks always run while the class/caps are still
        # unadopted so the first-frame protocol is unchanged.
        self._frame_i += 1
        # adopted-caps check by key presence: _class_caps may legitimately
        # store None ("partition doesn't pay"), which is still adopted
        settled = mb is not None and h in self._ccaps
        if settled and self.stats_every > 1 and (
            self._frame_i % self.stats_every
        ):
            return img
        if stats is not None and self._uses_pallas():
            used = int(stats["blocks_used"])
            if cc is not None and bool(stats.get("class_overflow", False)):
                # footprint-class overflow: spilled records rendered with
                # shrunk footprints — drop back to the safe expansion for
                # this frame (the safe re-render below re-runs the census
                # and adopts fresh caps)
                self._ccaps[h] = None
                return self.frame(camera, key)
            if mb is not None and used > mb:
                # capacity overflow: grow the class and re-render this frame
                self._class[h] = _capacity_class(used, self.CLASS_HEADROOM)
                return self.frame(camera, key)
            if mb is None:
                # first frame ran at the safe bound; adopt a tight class
                self._class[h] = _capacity_class(used, self.CLASS_HEADROOM)
            if cc is None and "class_counts" in stats:
                # every safe-expansion frame re-runs the census, so caps
                # recover after an overflow once the distribution settles
                # (the 1024-granular rounding + headroom damp flapping)
                n_hi, n_mid = (int(x) for x in stats["class_counts"])
                self._ccaps[h] = _class_caps(
                    n_hi, n_mid, self.n,
                    self.rcfg.tiles_per_splat_cap, self.PAIR_CAP_HEADROOM,
                )
        return img


class SplatEngine(Engine):
    """Engine for a STATIC splat set — pre-trained 3DGS scenes
    (utils/ply.py), fitted outputs, or any hand-built plane pytree — with
    optional view-dependent SH color (render/sh.py).

    Same frame(camera, key) surface and blend-capacity-class protocol as
    Engine, minus the per-frame SDF modeling: the splats are constants of
    the jitted frame's ARGUMENTS (never closure captures — the relay
    miscompile rule, CLAUDE.md), and `sh`, when given, lights every frame
    along the camera ray before projection.

    Usage:
        splats, sh = load_ply("garden.ply", with_sh=True)
        eng = SplatEngine(splats, rcfg, sh=sh)
        serve(eng)          # orbit a real pre-trained scene on the TPU
    """

    def __init__(
        self,
        splats,
        rcfg: RenderConfig = RenderConfig(),
        sh=None,
        compositor: str = "auto",
        cache_size: int = 8,
        blend_kernel: str = "tile",
        stats_every: int = 1,
    ):
        self.splats = splats
        self.sh = sh
        self.rcfg = rcfg
        self.compositor = compositor
        self.blend_kernel = blend_kernel
        self.stats_every = stats_every
        self.scene = None
        self._frame_i = -1
        self._cache: Dict[Tuple, Callable] = {}
        self._class: Dict[str, Optional[int]] = {}
        self._ccaps: Dict[str, Optional[Tuple[int, int]]] = {}
        self._cache_size = cache_size

    @property
    def n(self) -> int:
        return int(self.splats["px"].shape[0])

    def _key(self) -> str:
        return "static-splats"

    def _frame_splats(self, camera: CameraArrays, key: jax.Array):
        if self.sh is not None:
            from .sh import apply_sh

            return jax.jit(apply_sh)(self.splats, self.sh, camera["cam_pos"])
        return self.splats

    def _args(self, camera: CameraArrays, key: jax.Array) -> Tuple:
        return (self.splats, self.sh, camera, key)

    def _build(self, mb: Optional[int], cc: Optional[Tuple[int, int]]) -> Callable:
        rcfg, comp, bk = self.rcfg, self.compositor, self.blend_kernel
        from .sh import apply_sh

        @jax.jit
        def frame(splats, sh, camera, key):
            if sh is not None:
                splats = apply_sh(splats, sh, camera["cam_pos"])
            return render_splats(
                splats, camera, rcfg, comp,
                blend_max_blocks=mb, return_stats=True, blend_kernel=bk,
                pair_class_caps=cc,
            )

        return frame


def _class_caps(
    n_hi: int, n_mid: int, n: int, cap: int, headroom: float = 1.15
) -> Optional[Tuple[int, int]]:
    """Size the binner's (C4, C2) footprint-class capacities from the census
    (1024-granular, with headroom), or None when the class partition would
    not shrink the pair-sort input enough to pay for its extra N-scale sort
    (needs roughly a 25%+ cut).

    headroom 1.15 (round 5, was 1.25): every slack slot costs pair-sort
    rows whose payload movement is ~1.35-1.85 ms/column per 2.45M rows
    (probe_bin_r5 + the sort-output probes in NOTES) — the tighter margin
    measures -0.33 ms on the headline.  Camera-motion census drift beyond
    it trips class_overflow, which the Engine already handles by one safe
    re-render + fresh caps (the same protocol as blend-capacity growth)."""
    c4 = _capacity_class(n_hi, headroom)
    c2 = _capacity_class(n_mid - n_hi, headroom)
    if c4 + c2 > n:
        return None
    p_class = cap * c4 + 2 * c2 + (n - c4 - c2)
    if p_class > 0.75 * cap * n:
        return None
    return (c4, c2)


def _capacity_class(used: int, headroom: float = 1.25) -> int:
    """Round the needed window count up to a 1024-granular class with
    headroom — coarse enough that camera motion rarely crosses a class
    boundary (each crossing retraces), fine enough not to pay the ~0.3 us
    per unused grid step for thousands of trash steps."""
    return max(1024, -(-int(used * headroom) // 1024) * 1024)
