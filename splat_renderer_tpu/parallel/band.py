"""Rank-band splat-parallel compositing: shard the SORT and the BLEND.

The tile-band mode (parallel/sharding.py) all-gathers the full splat set and
shards only the compositor's pixels — every device still pays the full
N-scale pair sort, the single-chip wall (~1/3 of the frame at 1M @1080p).
This module shards the splats themselves by GLOBAL DEPTH RANK:

1. each device models + projects its n/sp splats locally (packed u32 words);
2. a 256-bucket depth-key histogram is psum'd over the mesh and cut into
   sp near-equal GLOBAL DEPTH BANDS (splitter buckets);
3. one `all_to_all` routes every record to its band's device (static
   (sp, n_local) masked layout — invalid slots carry +inf depth keys and
   sort to the tail);
4. each device runs the UNCHANGED single-device chain (canonical record
   sort -> pair expansion -> pair sort -> streaming blend) on its band,
   compacted to a static per-band capacity (`bin_packed_words(compact_to=)`)
   so the pair-scale work is ~1/sp of the single-chip cost;
5. per-tile premultiplied partials (color, alpha) combine across devices in
   band order with the associative `blend.over_merge` — depth bands make
   'over' segment-concatenation across devices EXACT (front-to-back 'over'
   is associative, just not commutative).

Why this is exact: band b holds a contiguous range of the canonical
(depth_bits, global input index) order — every record of band b composites
before every record of band b+1 in EVERY tile — so merging the per-band
partials in band order reproduces the single-device composite bit-for-fp.
Equal depth keys never straddle a band (the splitter compares whole key
values), and the in-band tie-break is the global input index, reconstructed
from the all_to_all layout (row s of the received (sp, n_local) block came
from device s, so flat row index == dev-major global index — the same order
the single-device reference uses).

Capacity semantics (the engine-wide pattern): each band keeps at most
`band_capacity = slack * n/sp` records; the histogram cut keeps bands near
balanced, and overflowing records (the DEEPEST in an over-full band) are
dropped and flagged in the returned stats — never garbage.  The reference
has no distributed anything (SURVEY.md section 2.5); this design follows
the "collectives ride ICI" recipe: one all_to_all of packed words
(16 B/record) + one partial-layer gather per frame.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PointConfig, RenderConfig
from ..render.binning import bin_packed_words
from ..render.blend import over_merge
from ..render.compositor import tiles_to_image
from ..render.pipeline import CameraArrays, model_points, on_tpu
from ..render.projector import splat_screen_words
from ..sdf.scene import Params, SDFScene

N_BUCKETS = 256


def depth_band(dk: jnp.ndarray, axis_name: str, sp: int) -> jnp.ndarray:
    """Assign each local record a global depth band in [0, sp).

    Histogram the top 8 bits of the monotonic depth key (u32, packing
    .depth_bits), psum over the mesh, and cut the global cumulative counts
    into sp near-equal bands.  Scatter-free: the 256-bucket histogram is a
    broadcast-compare reduction (64M lane ops at 1M records — trivial), and
    band assignment is two compares per splitter.
    """
    # bucket on the key RANGE actually present (the raw top bits are f32
    # sign+exponent — a scene within one depth octave would land in a single
    # bucket): min/max over the mesh, then 256 equal key-space slices.
    # Equal keys share a bucket, so depth ties never straddle a band.
    inf_key = jnp.uint32(0xFF800000)
    valid = dk < inf_key
    mn = jax.lax.pmin(jnp.min(jnp.where(valid, dk, inf_key)), axis_name)
    mx = jax.lax.pmax(jnp.max(jnp.where(valid, dk, jnp.uint32(0))), axis_name)
    span = jnp.maximum(mx - mn, jnp.uint32(1)).astype(jnp.float32)
    rel = (jnp.where(valid, dk, mn) - mn).astype(jnp.float32)
    bucket = jnp.clip(
        (rel * (N_BUCKETS / 1.0) / span).astype(jnp.int32), 0, N_BUCKETS - 1
    )
    bucket = jnp.where(valid, bucket, N_BUCKETS - 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (N_BUCKETS, 1), 0)
    hist = jnp.sum(
        (bucket[None, :] == ids).astype(jnp.float32), axis=1
    )  # (256,) exact in f32 (counts < 2^24)
    hist = jax.lax.psum(hist, axis_name)
    cum = jnp.cumsum(hist)
    total = cum[-1]
    band = jnp.zeros(bucket.shape, jnp.int32)
    for k in range(1, sp):
        # splitter bucket: first bucket whose cumulative count reaches k/sp
        # of the total; records in buckets >= splitter go to band >= k
        target = total * (k / sp)
        split_bucket = jnp.sum((cum < target).astype(jnp.int32))
        band = band + (bucket >= split_bucket).astype(jnp.int32)
    return band


def band_frame_fn(
    scene: SDFScene,
    mesh: Mesh,
    n: int,
    pcfg: PointConfig,
    rcfg: RenderConfig,
    compositor: str = "auto",
    band_slack: float = 1.5,
    blend_block: int = 1024,
):
    """Build the jittable rank-band splat-parallel frame step.

    Returns fn(params, camera, key) -> (image (H, W, 3) replicated, stats)
    where stats = {"band_overflow": bool, "band_max_count": int32}.
    Uses every device of the mesh as one flat "sp" axis.
    """
    sp = int(np.prod(list(mesh.shape.values())))
    if n % sp:
        raise ValueError(f"point count {n} must be divisible by sp={sp}")
    n_local = n // sp
    cap_band = max(1, int(np.ceil(band_slack * n_local)))
    if compositor == "auto":
        compositor = "pallas" if on_tpu() else "tiles"
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("sp",))

    def local_step(params: Params, camera: CameraArrays, key: jax.Array):
        dev = jax.lax.axis_index("sp")
        k = jax.random.fold_in(key, dev)
        splats = model_points(scene, params, k, n_local, pcfg, rcfg)
        w = splat_screen_words(
            splats, camera["view_proj"], camera["cam_pos"], rcfg
        )

        band = depth_band(w["dk"], "sp", sp)

        # static masked all_to_all layout: row b carries this device's
        # band-b records; sentinels get +inf depth keys (sort last, binned
        # as invalid).  Projection-invalid records (dk >= the +inf depth
        # key) are NOT routed at all — they would otherwise land in the last
        # band and inflate its count, firing band_overflow spuriously when
        # nothing visible was dropped (they contribute zero alpha anyway).
        rows = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)
        inf_depth = jnp.uint32(0xFF800000)  # packing.depth_bits(+inf)
        keep = (band[None, :] == rows) & (w["dk"] < inf_depth)[None, :]
        sent_key = jnp.uint32(0xFFFFFFFF)

        def route(col, sentinel):
            buf = jnp.where(keep, col[None, :], sentinel)
            return jax.lax.all_to_all(
                buf, "sp", split_axis=0, concat_axis=0, tiled=False
            )

        # all_to_all with split_axis=0 on (sp, n_local): device d receives
        # (sp, n_local) where row s came from source device s — flat row
        # index s * n_local + i IS the dev-major global input index, the
        # canonical tie-break (matches the single-device reference order).
        dk_r = route(w["dk"], sent_key).reshape(-1)
        pos_r = route(w["w_pos"], jnp.uint32(0)).reshape(-1)
        ro_r = route(w["w_ro"], jnp.uint32(0)).reshape(-1)
        rgb_r = route(w["w_rgb"], jnp.uint32(0)).reshape(-1)

        # records this band must actually composite (excludes sentinels AND
        # projection-invalid records)
        n_valid = jnp.sum((dk_r < inf_depth).astype(jnp.int32))

        binned = bin_packed_words(
            dk_r, pos_r, ro_r, rgb_r, rcfg, blend_block, compact_to=cap_band
        )
        if compositor == "pallas":
            from ..ops.tile_blend import render_tiles_pallas

            tile_color, tile_alpha = render_tiles_pallas(
                None, binned, rcfg, block=blend_block, return_tiles=True
            )
        else:
            # CPU-mesh path (dryrun/tests): unpack the compacted stream back
            # to records and run the readable XLA compositor
            from ..render.compositor import render_tiles
            from ..render.packing import unpack_words
            from ..render.binning import bin_splats

            # rebuild (K, 10) records from the canonically-sorted compact
            # columns: re-sort locally (cheap at K) to reuse the record path
            cols = unpack_words(pos_r, ro_r, rgb_r, rcfg)
            depth = _keys_to_depth(dk_r)
            data = jnp.stack(
                [cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                 cols[6], depth, cols[7], cols[8]], axis=-1,
            )
            from ..render.binning import canonical_sort_data

            ds = canonical_sort_data(data, rcfg)[:cap_band]
            tile_color, tile_alpha = render_tiles(
                ds, bin_splats(ds, rcfg), rcfg, return_tiles=True
            )

        # ---- band-order over-merge across the mesh ----
        # gather every band's partial layers, fold front-to-back (band 0 is
        # the nearest depth range)
        colors = jax.lax.all_gather(tile_color, "sp", axis=0)  # (sp, T, tp, 3)
        alphas = jax.lax.all_gather(tile_alpha, "sp", axis=0)  # (sp, T, tp)
        out_c, out_a = colors[0], alphas[0]
        for b in range(1, sp):
            out_c, out_a = over_merge(out_c, out_a, colors[b], alphas[b])
        img = tiles_to_image(out_c, out_a, rcfg)
        # replicate the stats (any band overflowing flags the frame)
        overflow = jax.lax.pmax(
            (n_valid > cap_band).astype(jnp.int32), "sp"
        ).astype(jnp.bool_)
        # wire census (NOTES.md "Multi-chip scaling model"): VALID records
        # actually crossing ICI (off-diagonal all_to_all rows; the diagonal
        # row stays on-device) and the total valid population — the dryrun
        # asserts these against the model's formulas, tying the scaling
        # table to executed code (VERDICT r3 item 6)
        off_diag = rows != dev
        routed_off = jnp.sum((keep & off_diag).astype(jnp.int32))
        valid_local = jnp.sum((w["dk"] < inf_depth).astype(jnp.int32))
        return img, {
            "band_overflow": overflow,
            "band_max_count": jax.lax.pmax(n_valid, "sp"),
            "routed_records": jax.lax.psum(routed_off, "sp"),
            "valid_records": jax.lax.psum(valid_local, "sp"),
        }

    shard_fn = jax.shard_map(
        local_step,
        mesh=flat_mesh,
        in_specs=(P(), P(), P()),
        out_specs=(
            P(),
            {
                "band_overflow": P(),
                "band_max_count": P(),
                "routed_records": P(),
                "valid_records": P(),
            },
        ),
        check_vma=False,
    )
    fn = jax.jit(shard_fn)

    def wrapped(params, camera, key):
        return fn(params, camera, key)

    # static per-frame wire volumes, straight from the collective buffer
    # shapes this factory just built (n_words = dk/pos/ro/rgb u32 columns;
    # gather layers = 3 color + 1 alpha f32 per tile pixel).  The NOTES.md
    # scaling model's bytes columns are THESE numbers x the link rate; the
    # dryrun recomputes the model formulas independently and asserts
    # equality (VERDICT r3 item 6).
    wrapped.wire_model = {
        "sp": sp,
        "n_local": n_local,
        "a2a_egress_bytes_per_device": (sp - 1) * n_local * 4 * 4,
        "gather_ingress_bytes_per_device": (
            (sp - 1) * rcfg.num_tiles * rcfg.tile_pixels * 4 * 4
        ),
    }
    return wrapped


def _keys_to_depth(dk: jnp.ndarray) -> jnp.ndarray:
    """Invert packing.depth_bits (non-negative depths only; +inf keys map
    back to +inf)."""
    bits = jnp.where(
        (dk >> jnp.uint32(31)) == 1,
        dk & jnp.uint32(0x7FFFFFFF),
        ~dk,
    )
    return jax.lax.bitcast_convert_type(bits, jnp.float32)
