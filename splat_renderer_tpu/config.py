"""Central configuration for the TPU splat engine.

The reference scatters its tuning knobs as hardcoded constants across ten files
(tile size 16 at src/TileBinner.ts:35, Gaussian sigma 0.5 at
src/ComputeShaderRenderer.ts:139, curvature probe radius 0.02 at
src/CurvatureSampler.ts:99, point-count heuristic at src/PointManager.ts:28-38,
splat radius 0.04 at src/SplatPropertyManager.ts:94-95, ...).  Here they live in
two frozen (hence hashable, hence jit-static) dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class PointConfig:
    """Surface-point generation & refinement knobs.

    Mirrors the live modeler path of the reference:
    - points_per_primitive / min/max_points: src/PointManager.ts:28-38
    - aabb_scale: the 1.5x seeding margin, src/PointManager.ts:212-213
    - descent_steps: the 5x gradient-descent loop, src/main.ts:149-172
    - probe_radius / curvature mapping: src/CurvatureSampler.ts:99,128-134
    """

    points_per_primitive: int = 30_000
    min_points: int = 10_000
    max_points: int = 200_000
    aabb_scale: float = 1.5
    descent_steps: int = 5
    probe_radius: float = 0.02
    # scale = lerp(curvature_min_scale, 1.0, 1 - smoothstep(0, curvature_range, var))
    curvature_min_scale: float = 0.01
    curvature_range: float = 0.5


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Splat rasterization knobs (tile pipeline + compositors)."""

    width: int = 1920
    height: int = 1080
    tile_size: int = 16  # tile WIDTH in px; src/TileBinner.ts:35 default
    # Tile HEIGHT in px; 0 = square tiles (tile_size).  Rectangular tiles
    # decouple the two costs tile geometry trades against each other: the
    # pair-sort rows scale with the per-AXIS straddle probability (~2*margin*
    # radius / tile extent, independently in x and y) while the blend's
    # pixels-per-record scale with tile AREA.  A 32x16 tile keeps the 32 px
    # x-extent's straddle collapse (the round-3 class-cap win) at HALF the
    # blend pixels of 32x32 — measured ~1.9M pair rows AND ~1.0 G pair-px at
    # the 1M @1080p bench shape, the best of both square sizes
    # (benchmarks/probe_tile_size.py).  The reference hardcodes square 16 px
    # tiles (src/TileBinner.ts:35); rectangular tiles have no counterpart.
    tile_height: int = 0
    # Gaussian falloff of the per-pixel compositor, src/ComputeShaderRenderer.ts:139
    sigma: float = 0.5
    # Bounding box padding: 1.5 * screenRadius covers ~99% of the Gaussian,
    # src/SplatProjector.ts:115-121
    bounds_margin: float = 1.5
    # Splats smaller than this many pixels are dropped,
    # src/ComputeShaderRenderer.ts:127-129
    min_screen_radius: float = 0.5
    # Base world-space splat radius; the reference hardcodes 0.04 ("TEMPORARY",
    # src/SplatPropertyManager.ts:94-95) and ignores the curvature scale there;
    # we multiply by the curvature scale (resolving SURVEY.md section 2.4 item 4).
    base_radius: float = 0.04
    base_opacity: float = 1.0  # src/SplatPropertyManager.ts:102
    background: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    # Lighting of the tile/sequential compositors, src/ComputeShaderRenderer.ts:143-145
    light_dir: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    light_ambient: float = 0.85
    light_diffuse: float = 0.15
    # --- static-shape capacities (TPU has no dynamic allocation mid-frame) ---
    # Max screen-tiles a single splat may overlap (per axis the cap is
    # sqrt(tile_cap)).  Splats overlapping more get their binning footprint
    # clamped (the reference warns at >20x average overlap,
    # src/GPUTileBinner.ts:265-281; we clamp instead of warn).
    tiles_per_splat_cap: int = 16
    # Transmittance floor for early termination: matches the reference's
    # `alpha >= 0.99` accumulation exit (src/ComputeShaderRenderer.ts:188-190).
    transmittance_eps: float = 0.01
    # Opaque z-buffer mode: hard ellipse coverage, nearest splat wins — the
    # reference's live-path quad renderer semantics (src/Renderer.ts:189-201).
    opaque: bool = False
    # Surface-oriented splats: screen ellipses foreshortened by the surface
    # normal (the reference's tangent-frame quads, src/Renderer.ts:90-117).
    # False = isotropic discs (the reference's splat pipeline).
    oriented: bool = False
    # Square-quad coverage for the opaque mode: the reference's live path
    # draws FULL tangent-frame squares with no disc discard
    # (src/Renderer.ts:95-131, fragment :133-144 ignores uv), so its
    # footprint keeps the corners the inscribed ellipse/disc drops.  True =
    # reference-exact square coverage (|u| <= r along the ellipse frame,
    # |v| <= r * ratio across); False (default) = the ellipse/disc model.
    # Only meaningful with opaque=True.
    quad: bool = False
    # Screen-ellipse model for oriented splats:
    #   "foreshorten": minor axis along the normal's screen projection,
    #       minor/major = |n . view| — the reference's tangent-quad look
    #       (src/Renderer.ts:90-117) as a cheap approximation.
    #   "ewa": true perspective 2D covariance of the world-space disc,
    #       M = r^2 (J J^T - (J n)(J n)^T) with J the screen Jacobian at the
    #       splat center, eigendecomposed to (major, minor/major, angle) —
    #       the EWA-splatting projection (Zwicker et al. 2001) specialized to
    #       flat discs.  Both quantize onto the SAME record grids; every
    #       compositor (oracle included) consumes them identically, so parity
    #       gating is unchanged.
    ellipse: str = "foreshorten"
    # Fast profile (opt-in): permits ONE bounded, documented deviation from
    # the exact oracle in exchange for ~3 ms/frame at 1M @1080p — the pair
    # sort coarsens the canonical rank just enough to fuse (tile, rank) into
    # ONE u32 key (measured v5e: nk1 9.1 ms vs nk2 12.0 ms @4M pairs).
    # Records within the same 2^coarse-row band of the depth sort (coarse <=
    # 4 bits) may composite in arbitrary order inside one tile — a
    # sub-quantization-step order deviation.  At scales where the exact key
    # already fits 32 bits, the flag changes nothing.  The exact profile
    # (default) stays bit-gated against the oracle.  The reference has no
    # analogous mode — this is the standard production-rasterizer trade.
    # (A blend-kernel log-space MXU fast path was tried and REMOVED: 4.6x
    # slower, see ops/tile_blend.py.)
    fast_math: bool = False
    # Depth-key pair ordering (opt-in, turbo preset): skip the N-scale
    # canonical record sort entirely and fuse (tile << shift) | top
    # (32 - tile_bits) bits of the IEEE-flipped depth key as the single
    # pair-sort key (binning.bin_packed_words).  Saves the whole record
    # stage (one num_keys=2 sort with 2-3 payload columns at N scale);
    # the deviation is that same-tile records whose depth keys agree in
    # the kept high bits (~2^-10 relative depth at 1080p's 13 tile bits)
    # composite in arbitrary order — strictly coarser than fast_math's
    # sub-quantization rank bands, bounded by the turbo SSIM gate.  Ignored
    # by the band (compact_to) and class-partition paths, which need
    # canonical ranks.  The reference always orders by the full 32-bit key
    # (src/RadixSorter.ts:197-264); the exact profile (default) does too.
    depth_key_order: bool = False
    # Anti-aliasing dilation (opt-in): screen-space variance (px^2) added to
    # every splat's Gaussian covariance before quantization, with opacity
    # scaled by sqrt(det Sigma / det Sigma') so total splat mass is
    # conserved (the mip-splatting 2D low-pass; standard 3DGS rasterizers
    # use 0.3).  Sub-pixel splats fade smoothly instead of popping against
    # the min_screen_radius cutoff when a pre-trained scene (utils/ply.py)
    # is rendered below its training resolution.  Applied in the RECORD
    # domain (projector.shade_planes), so every compositor — oracle, XLA
    # tiles, Pallas, the differentiable paths — inherits it with parity by
    # construction.  Gaussian profiles only (ignored when cfg.opaque); the
    # reference has no anti-aliasing at all.
    aa_dilation: float = 0.0
    # Splat base color from the surface normal:
    #   "normal_abs":    |n| * 0.8 + 0.2  (splat pipeline,
    #                    src/SplatPropertyManager.ts:97-98)
    #   "normal_signed": n * 0.5 + 0.5    (live quad renderer,
    #                    src/Renderer.ts:127-128)
    color_mode: str = "normal_abs"
    # Chunk of splats blended per scan step in the compositors.
    blend_chunk: int = 32

    @property
    def tile_w(self) -> int:
        """Tile width in px (alias of tile_size; see tile_height)."""
        return self.tile_size

    @property
    def tile_h(self) -> int:
        """Tile height in px (tile_height, or square when 0)."""
        return self.tile_height if self.tile_height else self.tile_size

    @property
    def r_cap(self) -> float:
        """Screen-radius cap: the largest radius whose padded bounds box
        (side 2*bounds_margin*r) spans at most floor(sqrt(tiles_per_splat_
        cap)) tiles per axis — governed by the SMALLER tile extent for
        rectangular tiles.  THE single definition — the projector clamp,
        the EWA major-axis clamp, the 2-word r:10 bit budget and the bench
        clamp stats all derive from it (they must agree exactly or binning
        silently drops covered tiles)."""
        k = max(int(self.tiles_per_splat_cap ** 0.5), 2)
        return (k - 1) * min(self.tile_w, self.tile_h) / (2.0 * self.bounds_margin)

    @property
    def pos_offset(self) -> float:
        """Origin shift of the u16 fixed-point screen grid: centers down to
        -256 px (clipped splats; radii are capped far below this)."""
        return 256.0

    @property
    def pos_scale(self) -> float:
        """Subpixel scale of the u16 fixed-point screen grid (1/scale px).

        The largest power of two whose u16 range [0, 65535] covers
        [-pos_offset, max(width, height) + pos_offset] px, capped at 32
        (1/32 px).  Sizing the grid to the frame fixes the silent clamp the
        fixed 1/32 grid had beyond 1791 px at 1920-wide frames."""
        span = max(self.width, self.height) + 2.0 * self.pos_offset
        scale = 32.0
        while scale > 1.0 and span * scale > 65535.0:
            scale /= 2.0
        if span * scale > 65535.0:
            raise ValueError(
                f"frame {self.width}x{self.height} exceeds the u16 screen "
                "grid even at 1 px resolution (max ~65023 px per axis)"
            )
        return scale

    @property
    def tiles_x(self) -> int:
        return _cdiv(self.width, self.tile_w)

    @property
    def tiles_y(self) -> int:
        return _cdiv(self.height, self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def tile_pixels(self) -> int:
        return self.tile_w * self.tile_h

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def turbo_render_config(width: int = 1920, height: int = 1080, **kw) -> RenderConfig:
    """Approximation preset for throughput-first rendering (opt-in).

    Stacks the documented, bounded deviations from the exact profile:
    - fast_math=True: coarse-rank fused pair-sort key (sub-quantization
      compositing-order deviation; see the fast_math field).
    - depth_key_order=True: the pair key carries the depth key's high bits
      instead of the canonical rank, skipping the N-scale record sort
      (ordering coarsens to ~2^-10 relative depth; see the field).
    - bounds_margin 1.5 -> 1.3: the Gaussian support disc is cut at 1.3r
      instead of the reference's 1.5r box pad (src/SplatProjector.ts:115-121)
      — edge alpha rises from 1.1e-2*op to 3.4e-2*op, and every pipeline
      stage (binning footprint, r_cap, blend cutoff, oracle) shrinks
      COHERENTLY, so the pipeline still self-gates against its own oracle;
      the deviation is vs margin-1.5 ground truth only.  Measured on the
      50k-splat demo scene @256^2: SSIM 0.9977, PSNR 40.7 dB
      (tests/test_render.py::TestTurboProfile re-checks the bound; bench.py
      reports the turbo frame time and its SSIM at the bench scene).

    The exact profile stays the default everywhere; this is the standard
    production-rasterizer quality/speed knob the reference lacks.

    Tile geometry note: turbo deliberately KEEPS 16 px square tiles while
    the exact headline runs 32x16 + class-partitioned pair expansion —
    depth_key_order has no canonical ranks, so the class partition (which
    consumes them) cannot compose; and plain 32x16 WITHOUT class caps
    loses (the blend's 2x pixels-per-record eats the straddle win,
    benchmarks/probe_tile_size.py).  A rank-keyed "fast" variant that does
    compose with 32x16 + caps is what bench.py's fast-profile row
    measures (fast_math + bounds_margin 1.3 on the headline geometry).
    """
    defaults = dict(width=width, height=height, fast_math=True,
                    bounds_margin=1.3, depth_key_order=True)
    defaults.update(kw)
    return RenderConfig(**defaults)


def surface_render_config(width: int = 1920, height: int = 1080, **kw) -> RenderConfig:
    """Preset matching the reference's LIVE path: opaque surface-oriented
    splats with signed-normal coloring and 0.3/0.7 ambient/diffuse lighting
    (src/Renderer.ts:104-105,127-144).  base_radius 0.025 is the quad
    half-extent at src/Renderer.ts:104."""
    defaults = dict(
        width=width,
        height=height,
        opaque=True,
        oriented=True,
        color_mode="normal_signed",
        light_ambient=0.3,
        light_diffuse=0.7,
        base_radius=0.025,
        base_opacity=1.0,
    )
    defaults.update(kw)
    return RenderConfig(**defaults)
