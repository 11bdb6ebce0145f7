"""Benchmark: the five BASELINE.json configs on one TPU chip.

Prints ONE JSON line (stdout):
  {"metric": ..., "value": FPS, "unit": "fps", "vs_baseline": FPS/60, ...}

Baseline: the reference's north-star target of 1M splats @ 60 FPS
(3D_PLAN.md:379-382; BASELINE.md "Targets"), so vs_baseline = fps / 60.

Round-4 harness design (VERDICT.md round 3, item 1 — BENCH_r03 timed out):
  * persistent XLA compilation cache (.jax_cache/) — repeat runs stop
    recompiling ~40 programs over the axon relay;
  * a WALL-CLOCK BUDGET (env BENCH_BUDGET_S, default 1080 s): metrics run
    headline-first in priority order; before each step the harness checks
    remaining budget against the step's conservative cold-compile cost
    estimate and skips the rest when spent, listing them in "skipped";
  * every step is try/except-wrapped: a failure degrades that step's
    fields (recorded in "errors"), never the run;
  * per-step progress lines go to stderr so a timeout is diagnosable;
  * skipped/failed fields are OMITTED from the JSON (never null) so the CI
    schema check can keep rejecting nulls.

Timing estimators (round-5 correction, utils/timing.py): the relay's
fixed cost is ~26 ms PER BURST (the device_get barrier round trip) plus
~0.1 ms per dispatch — NOT the ~2.5 ms/dispatch round 2 concluded from a
single burst length.  Burst-mean estimators therefore overstate every
frame by barrier/iters (+5.2 ms at iters=5!), which a deployment loop —
or the reference's rAF loop — never pays.  All FPS-visible metrics now
use time_fn_sustained: the MARGINAL per-frame cost across two burst
lengths, where the barrier cancels exactly; min over 3 weather rounds.
frame_ms_burst5 keeps the old estimator for cross-round continuity, and
relay_barrier_ms / dispatch_overhead_ms record the measured cost model.

Headline config (round 3, benchmarks/probe_tile_size.py): RECTANGULAR
32x16 tiles + the Engine's class-partitioned pair expansion; the 32 px
x-extent collapses the straddle census (pair rows 4M -> ~2.45M with class
caps) while the 16 px y-extent keeps blend pixels-per-record at half of
32x32 AND r_cap on the fine 16 px quantization grid.  16 px square remains
the turbo preset's tile size (depth_key_order cannot compose with the
class partition — it has no ranks).

Stage accounting: bin_ms is the FULL binning pass (which contains the pair
sort); sort_ms is the isolated pair sort so the sort's share is visible.
Fused stage_* deltas (P1 = project, P2 = project+bin, P3 = full frame) are
interleaved sustained marginals, so both the barrier AND the per-dispatch
cost cancel; BENCH_r04's stage_project_ms = 3.455 was almost entirely the
estimator mismatch (P1 at barrier/5 minus a trivial add at barrier/20) —
the true project stage measures ~0.06 ms because it fuses completely.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# Persistent compilation cache: the single biggest lever for finishing
# inside the driver's time budget — without it every one of the ~40 jitted
# programs recompiles over the relay on every run (BENCH_r03: rc 124).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.ops.tile_blend import render_tiles_pallas
from splat_renderer_tpu.render.binning import bin_splats_packed
from splat_renderer_tpu.render.pipeline import (
    _class_caps,
    model_points,
    render_splats,
    splat_screen_data,
)
from splat_renderer_tpu.utils.timing import (
    relay_cost_model,
    time_fn,
    time_fn_best,
    time_fn_sustained,
)

N_SPLATS = 1_000_000
WIDTH, HEIGHT = 1920, 1080
BLOCK = 1024
# any sustained marginal below this is a weather-corrupted measurement,
# not a number — mark it, never publish 0.0 (VERDICT r4 item 4's rule,
# applied to EVERY scoreboard field)
FLOOR_MS = 0.15


def _emit_ms(R: dict, key: str, seconds: float,
             floor_ms: float = FLOOR_MS) -> bool:
    """Publish a sustained-marginal metric, or mark it in the single
    shared `below_floor` list (one shape for every sub-floor field)."""
    if seconds * 1e3 >= floor_ms:
        R[key] = round(seconds * 1e3, 3)
        return True
    R.setdefault("below_floor", []).append(key)
    return False


def _demo_scene():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    return spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))


def _capacity_class(data, rcfg, block=BLOCK, headroom=1.25) -> int:
    """One safe-bound binning to size the steady-state blend capacity class
    (1024-granular, mirroring pipeline.Engine's protocol)."""
    binned = jax.jit(lambda d: bin_splats_packed(d, rcfg, block))(data)
    used = int(np.asarray(binned["block_off"])[-1])
    return max(1024, -(-int(used * headroom) // 1024) * 1024)


class Harness:
    """Priority-ordered, budget-aware, failure-isolated metric runner.

    Every step executes in a WORKER THREAD under a watchdog deadline: a
    single relay dispatch (or device_get) can hang forever in a futex wait
    (observed live during round 4 — the relay stayed healthy for new
    processes while one request never completed), and a hung MAIN thread
    would ride the whole run into the driver's timeout, shipping rc 124 /
    parsed null exactly like BENCH_r03.  When the watchdog fires, the run
    stops scheduling steps (the runtime may be wedged), keeps every field
    gathered so far, and emits the partial JSON with exit 0."""

    def __init__(self, budget_s: float, min_deadline_s: float = 240.0,
                 grace_s: float = 60.0):
        self.t0 = time.perf_counter()
        self.budget = budget_s
        self.min_deadline = min_deadline_s
        self.grace = grace_s
        self.fields: dict = {}
        self.skipped: list[str] = []
        self.errors: dict[str, str] = {}
        self.step_s: dict[str, float] = {}
        self.hung_step: str | None = None
        # steps timed while an earlier abandoned step's thread was still
        # alive: its late device bursts compete with this step's dispatches,
        # so the published number may be inflated (ADVICE r4) — recorded so
        # the reader can discount them
        self.contaminated: list[str] = []
        self._abandoned: list = []  # (name, Thread) of watchdog-fired steps

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def remaining(self) -> float:
        return self.budget - self.elapsed() if self.budget > 0 else float("inf")

    def log(self, msg: str) -> None:
        print(f"[bench t={self.elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)

    def _probe_relay(self, timeout_s: float) -> bool:
        """One fresh tiny dispatch with its own deadline: distinguishes a
        single stalled request (relay healthy for new work — keep going)
        from a wedged runtime (stop scheduling, emit)."""
        import threading

        ok: list = []

        def probe():
            try:
                x = jnp.ones((8, 128), jnp.float32)
                jax.device_get(jax.jit(lambda v: v + 1.0)(x))
                ok.append(True)
            except Exception:
                pass

        t = threading.Thread(target=probe, daemon=True, name="relay-probe")
        t.start()
        t.join(timeout=timeout_s)
        return bool(ok)

    def step(self, name: str, cost_s: float, fn) -> bool:
        """Run `fn` if the remaining budget covers its conservative
        cold-compile cost estimate.  Returns True iff it ran and succeeded."""
        if self.hung_step is not None:
            # a previous step hung a dispatch: the runtime may be wedged —
            # don't feed it more work, just account the skip
            self.skipped.append(name)
            self.log(f"SKIP {name} (runtime wedged in {self.hung_step})")
            return False
        if self.remaining() < cost_s:
            self.skipped.append(name)
            self.log(f"SKIP {name} (est {cost_s:.0f}s > {self.remaining():.0f}s left)")
            return False
        live_abandoned = [n for n, th in self._abandoned if th.is_alive()]
        if live_abandoned:
            # a previously-abandoned step's thread is still issuing device
            # work: this step's timings may be contaminated by its bursts
            self.contaminated.append(name)
            self.log(f"WARN {name} runs while abandoned step(s) "
                     f"{live_abandoned} still alive — timings contaminated")
        self.log(f"start {name} (est {cost_s:.0f}s, {self.remaining():.0f}s left)")
        t0 = time.perf_counter()
        import threading

        box: dict = {}

        def run():
            try:
                fn()
                box["ok"] = True
            except Exception as e:  # degrade the step, never the run
                box["err"] = f"{type(e).__name__}: {e}"

        # deadline: generous multiple of the cold estimate, but never past
        # the remaining budget by more than a grace period
        deadline = min(max(3.0 * cost_s, self.min_deadline),
                       self.remaining() + self.grace)
        worker = threading.Thread(target=run, daemon=True, name=f"step-{name}")
        worker.start()
        worker.join(timeout=deadline)
        self.step_s[name] = round(time.perf_counter() - t0, 1)
        if worker.is_alive():
            # Observed live (round 4): a relay stall can be TRANSIENT — one
            # turbo-step dispatch futex-parked ~9 min, then completed and
            # the run recovered.  So a fired watchdog abandons the step
            # (its thread may still finish and write its fields — per-key
            # dict writes are atomic) but only stops scheduling if a fresh
            # tiny dispatch ALSO stalls, i.e. the runtime itself is wedged.
            self.errors[name] = (
                f"watchdog: still running after {deadline:.0f}s "
                "(relay stall); step abandoned"
            )
            self._abandoned.append((name, worker))
            self.log(f"STALL {name}: {self.errors[name]}")
            if not self._probe_relay(45.0):
                self.hung_step = name
                self.log("relay probe also stalled — runtime wedged, "
                         "emitting what we have")
            return False
        if "err" in box:
            self.errors[name] = box["err"]
            self.log(f"FAIL {name}: {box['err']}")
            return False
        self.log(f"done {name} in {self.step_s[name]:.1f}s")
        return True


def main() -> None:
    # Default sized so a warm-compilation-cache run (~850 s measured)
    # completes every metric; a cold-cache run (~1500 s measured) lands the
    # headline and the top-priority steps, skips the rest explicitly, and
    # still exits 0 well inside any plausible driver timeout (r02's cold
    # bench passed; r03's ~1900 s one did not).
    budget = float(os.environ.get("BENCH_BUDGET_S", "1080"))
    H = Harness(budget)
    R = H.fields

    scene = _demo_scene()
    # 1M splats at 1080p: small world radius keeps footprints at a few
    # pixels, the physically sensible regime at this density.
    rcfg = RenderConfig(
        width=WIDTH, height=HEIGHT, base_radius=0.008, tiles_per_splat_cap=4
    )
    rcfg32 = rcfg.replace(tile_size=32, tile_height=16)
    pcfg = PointConfig(descent_steps=5)
    cam = spt.Camera(aspect=WIDTH / HEIGHT)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    params = scene.params()
    key = jax.random.PRNGKey(0)

    # Mutable cross-step state (each step only reads what an earlier step
    # produced; a skipped producer makes the consumer fail fast into
    # `errors`, which is the intended degradation).
    S: dict = {}

    # ---- step 1 (REQUIRED): model 1M splats ----
    def step_model():
        model_j = jax.jit(lambda p, k: model_points(scene, p, k, N_SPLATS, pcfg, rcfg))
        t_model, splats = time_fn_sustained(model_j, params, key,
                                            iters_short=5, iters_long=20)
        S["splats"] = splats
        _emit_ms(R, "model_stage_ms", t_model)

    H.step("model_1m", 90, step_model)

    # ---- step 2 (REQUIRED, the headline): exact fused frame, 32x16 tiles
    # + class-partitioned pair expansion (Engine-auto protocol).  The image
    # stays oracle-exact — the class partition is output-identical whenever
    # the census fits; on overflow we fall back to the un-partitioned
    # timing instead of dying (BENCH_r03's mid-run assert is gone). ----
    def step_headline():
        splats = S["splats"]
        b32 = jax.jit(lambda s, c: bin_splats_packed(
            splat_screen_data(s, c, rcfg32), rcfg32, BLOCK))(splats, camera)
        mt32 = int(np.asarray(b32["tiles_used"]) * 1.15) + 8
        S["mt32"] = mt32

        def full32(s, c, cc=None):
            return render_splats(s, c, rcfg32, "pallas", BLOCK,
                                 blend_max_blocks=mt32, blend_kernel="tile",
                                 pair_class_caps=cc, return_stats=True)

        _, stats32 = jax.jit(lambda s, c: full32(s, c))(splats, camera)
        n_hi, n_mid = (int(x) for x in np.asarray(stats32["class_counts"]))
        cc32 = _class_caps(n_hi, n_mid, N_SPLATS, rcfg32.tiles_per_splat_cap)
        # SUSTAINED estimator (round 5): the marginal per-frame cost over
        # two burst lengths, which cancels the relay's ~26 ms PER-BURST
        # barrier (utils/timing.time_fn_sustained).  Earlier rounds' burst
        # means charged every frame barrier/iters = ~5.2 ms of measurement
        # overhead that a deployment loop (or the reference's rAF loop)
        # never pays.  frame_ms_burst5 keeps the old estimator for
        # cross-round continuity.
        fj = jax.jit(lambda s, c: full32(s, c, cc32))
        t_sus, (img_best, st_best) = time_fn_sustained(
            fj, splats, camera, iters_short=5, iters_long=20, bursts=3,
        )
        t_b5, _ = time_fn_best(fj, splats, camera, warmup=0, iters=5)
        overflow = cc32 is not None and bool(
            np.asarray(st_best["class_overflow"]))
        if overflow:
            # census drifted: the partitioned frame dropped pairs — its
            # timing is not an exact-frame number.  Re-time unpartitioned.
            H.log("headline class caps overflowed; falling back to cc=None")
            fj = jax.jit(lambda s, c: full32(s, c))
            t_sus, (img_best, _) = time_fn_sustained(
                fj, splats, camera, iters_short=5, iters_long=20, bursts=3,
            )
            t_b5, _ = time_fn_best(fj, splats, camera, warmup=0, iters=5)
        S["cc32"], S["img_best"] = cc32, img_best
        if t_sus <= 0.0:
            # a ~19 ms frame can only marginal to <= 0 when weather
            # corrupted the measurement — error the step (retry) rather
            # than publish an infinite-FPS headline
            raise RuntimeError("headline sustained marginal clamped to 0 "
                               "(weather-corrupted bursts)")
        fps = 1.0 / t_sus
        R.update({
            "value": round(fps, 3),
            "vs_baseline": round(fps / 60.0, 4),
            "msplats_per_sec": round(N_SPLATS * fps / 1e6, 2),
            "frame_ms": round(t_sus * 1e3, 3),
            "frame_ms_burst5": round(t_b5 * 1e3, 3),
            "headline_tile": "32x16",
            "headline_class_caps":
                list(cc32) if (cc32 is not None and not overflow) else [],
            "headline_class_overflow": overflow,
        })

    H.step("headline_32x16", 150, step_headline)

    # ---- step 3: fused-frame per-stage deltas at the headline config (the
    # honest method: each program carries ONE dispatch, so program-to-
    # program deltas cancel the relay's ~1.5-2.8 ms fixed launch cost). ----
    from splat_renderer_tpu.render.binning import bin_packed_words
    from splat_renderer_tpu.render.projector import project_planes, splat_screen_words

    def _stage_deltas(s_, c_, cfg_, mt_, t_disp, cc_=None, iters=(5, 20)):
        def p1(s, c):
            return splat_screen_words(s, c["view_proj"], c["cam_pos"], cfg_)

        def p2(s, c):
            w = splat_screen_words(s, c["view_proj"], c["cam_pos"], cfg_)
            return bin_packed_words(
                w["dk"], w["w_pos"], w["w_ro"], w["w_rgb"], cfg_, BLOCK,
                class_caps=cc_,
            )["pair_w"]

        def p3(s, c):
            return render_splats(s, c, cfg_, "pallas", BLOCK,
                                 blend_max_blocks=mt_, blend_kernel="tile",
                                 pair_class_caps=cc_)

        # INTERLEAVED sustained (marginal) timing: the burst rounds cycle
        # P1 P2 P3, P1 P2 P3, ... so all three programs sample the SAME
        # weather windows, and each program's time is the two-burst-length
        # MARGINAL — the relay's ~26 ms per-burst barrier cancels exactly
        # (round-5 cost model, utils/timing.py).  BENCH_r04's
        # stage_project_ms = 3.455 was almost entirely this barrier: P1
        # carried barrier/5 = 5.2 ms while the subtracted trivial-add
        # "dispatch overhead" carried only barrier/20 = 1.3 ms; the TRUE
        # project stage measures ~0.06 ms (it fuses completely).
        f1, f2, f3 = jax.jit(p1), jax.jit(p2), jax.jit(p3)
        for f in (f1, f2, f3):  # compile + settle outside the timing
            # device_get barrier, not block_until_ready (unreliable on the
            # relay — utils/timing rationale)
            jax.device_get(jax.tree.leaves(f(s_, c_))[0].ravel()[:1])
        isrt, ilng = iters
        tot = {k: [float("inf"), float("inf")] for k in (0, 1, 2)}
        for _ in range(3):
            for k, f in enumerate((f1, f2, f3)):
                ts, _ = time_fn(f, s_, c_, warmup=0, iters=isrt)
                tl, _ = time_fn(f, s_, c_, warmup=0, iters=ilng)
                tot[k][0] = min(tot[k][0], ts * isrt)
                tot[k][1] = min(tot[k][1], tl * ilng)
        t1, t2, t3 = (
            max((tot[k][1] - tot[k][0]) / (ilng - isrt), 0.0) for k in (0, 1, 2)
        )
        return (max(t1 - t_disp, 0.0), max(t2 - t1, 0.0),
                max(t3 - t2, 0.0), t3)

    def step_stages_headline():
        # transport cost model (round 5): ~26 ms per BURST (the device_get
        # barrier round trip) + ~0.1 ms per dispatch.  The sustained
        # estimators cancel the barrier; P1 subtracts the true per-dispatch
        # cost; the P2-P1 / P3-P2 deltas cancel everything anyway.
        cm = relay_cost_model()
        t_disp = cm["per_dispatch_ms"] * 1e-3
        S["t_disp"] = t_disp
        p, b, bl, _ = _stage_deltas(S["splats"], camera, rcfg32, S["mt32"],
                                    t_disp, S["cc32"])
        R.update({
            "relay_barrier_ms": round(cm["barrier_ms"], 3),
            "dispatch_overhead_ms": round(cm["per_dispatch_ms"], 3),
            "stage_bin_ms": round(b * 1e3, 3),
            "stage_blend_ms": round(bl * 1e3, 3),
        })
        # the project stage FUSES completely (measured ~0.06 ms; the
        # 3.455 BENCH_r04 published was estimator artifact) — it usually
        # lands in below_floor rather than as a number
        _emit_ms(R, "stage_project_ms", p, floor_ms=0.1)

    H.step("stages_headline", 120, step_stages_headline)

    # ---- step 4: turbo profile (config.turbo_render_config): fast_math +
    # support cut at 1.3r — documented approximation preset; SSIM vs the
    # exact headline frame is reported so the trade is always visible.
    # Quality metrics are computed ON HOST with range asserts: BENCH_r02
    # shipped an impossible ssim=1.2312 from an on-device jit(ssim) scalar
    # (benchmarks/probe_ssim_device.py) — the scoreboard must never depend
    # on a device scalar. ----
    from splat_renderer_tpu.utils.ssim import quality_gate

    def step_turbo():
        splats = S["splats"]
        rcfg_turbo = spt.turbo_render_config(
            WIDTH, HEIGHT, base_radius=0.008, tiles_per_splat_cap=4
        )
        binned_turbo = jax.jit(lambda s, c: bin_splats_packed(
            splat_screen_data(s, c, rcfg_turbo), rcfg_turbo, BLOCK))(
            splats, camera)
        mt_turbo = int(np.asarray(binned_turbo["tiles_used"]) * 1.15) + 8

        def full_turbo(s, c):
            return render_splats(s, c, rcfg_turbo, "pallas", BLOCK,
                                 blend_max_blocks=mt_turbo, blend_kernel="tile")

        t_turbo, img_turbo = time_fn_sustained(
            jax.jit(full_turbo), splats, camera, iters_short=5,
            iters_long=20, bursts=3)
        if _emit_ms(R, "frame_ms_turbo", t_turbo):
            R["fps_turbo"] = round(1.0 / t_turbo, 2)
        R["ssim_turbo_vs_exact"] = round(quality_gate(
            jax.device_get(img_turbo), jax.device_get(S["img_best"])), 5)

    H.step("turbo", 100, step_turbo)

    # ---- step 5: ts=16 square-tile exact frame (r02 headline continuity)
    # + isolated per-stage programs (sort_ms inside bin_ms, blend alone) ----
    def step_ts16():
        splats = S["splats"]
        data = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(splats, camera)
        S["data"] = data

        project_j = jax.jit(
            lambda s, c: splat_screen_words(s, c["view_proj"], c["cam_pos"], rcfg)
        )
        t_project, _ = time_fn_sustained(project_j, splats, camera,
                                         iters_short=5, iters_long=20)

        # isolated pair sort (the stage the reference's RadixSorter owns):
        # record-rank sort at N plus the (tile, rank) pair sort at N*cap —
        # exactly bin_splats_packed's sort structure
        from splat_renderer_tpu.render.packing import depth_bits, pack_records

        cap = rcfg.tiles_per_splat_cap

        def pair_sort(d):
            dk = depth_bits(d[:, 7])
            w0, w1, w2 = pack_records(d, rcfg)
            iota = jax.lax.broadcasted_iota(jnp.int32, (N_SPLATS, 1), 0)[:, 0]
            _, _, w0, w1, w2 = jax.lax.sort(
                (dk, iota, w0, w1, w2), num_keys=2, is_stable=False
            )
            tile = jnp.zeros((cap * N_SPLATS,), jnp.int32)

            def bc(x):
                return jnp.broadcast_to(x[None, :], (cap, N_SPLATS)).reshape(-1)

            return jax.lax.sort(
                (tile, bc(iota), bc(w0), bc(w2)), num_keys=2, is_stable=False
            )[2]

        t_sort, _ = time_fn_sustained(jax.jit(pair_sort), data,
                                      iters_short=5, iters_long=20)

        bin_j = jax.jit(lambda d: bin_splats_packed(d, rcfg, BLOCK))
        t_bin, binned = time_fn_sustained(bin_j, data, iters_short=5,
                                          iters_long=20)
        blocks_used = int(np.asarray(binned["block_off"])[-1])
        mb = max(1024, -(-int(blocks_used * 1.25) // 1024) * 1024)
        blend_j = jax.jit(
            lambda d, b: render_tiles_pallas(d, b, rcfg, block=BLOCK, max_blocks=mb)
        )
        t_blend, _ = time_fn_sustained(blend_j, data, binned,
                                       iters_short=5, iters_long=20)

        mt = int(np.asarray(binned["tiles_used"]) * 1.15) + 8
        S["mt"] = mt

        def full(s, c):
            return render_splats(s, c, rcfg, "pallas", BLOCK,
                                 blend_max_blocks=mt, blend_kernel="tile")

        t_full, img_exact = time_fn_sustained(jax.jit(full), splats, camera,
                                              iters_short=5, iters_long=20)
        # sub-floor marginals go in below_floor, never published as 0.0
        for k, t in (("project_ms", t_project), ("sort_ms", t_sort),
                     ("bin_ms", t_bin), ("blend_ms", t_blend)):
            _emit_ms(R, k, t)
        _emit_ms(R, "frame_ms_ts16", t_full)
        R.update({
            "blend_blocks_used": blocks_used,
            "blend_capacity_class": mb,
            # the 32x16 headline shares ts=16's r grid (r_cap follows the
            # smaller tile extent), so only footprint-cap clamping can
            # differ; still self-gated against ITS OWN oracle on device
            # (drive_tpu_parity) — this cross-config SSIM keeps any trade
            # visible
            "ssim_headline_vs_ts16": round(quality_gate(
                jax.device_get(S["img_best"]), jax.device_get(img_exact)), 5),
        })

    H.step("ts16_stages", 150, step_ts16)

    # ---- step 6: the reference's own per-stage config: ~120k @1080p.
    # GPU_PIPELINE_PLAN.md:533-546 ("After" estimates): project 0.2,
    # extract keys 0.1, radix 2.0, count 0.6, scan 0.2, fill 0.7,
    # render 2.0 ms = 5.8 ms total.  Our bin stage owns keys+sort+binning
    # (their 2.9 ms); blend is their render (2.0 ms). ----
    def step_120k():
        cfg120 = RenderConfig(width=WIDTH, height=HEIGHT, base_radius=0.02,
                              tiles_per_splat_cap=4)
        s120 = jax.jit(lambda p, k: model_points(scene, p, k, 120_000, pcfg,
                                                 cfg120))(params, key)
        b120 = jax.jit(lambda s, c: bin_splats_packed(
            splat_screen_data(s, c, cfg120), cfg120, BLOCK))(s120, camera)
        mt120 = int(np.asarray(b120["tiles_used"]) * 1.15) + 8
        t_disp = S.get("t_disp", 0.0)
        # longer bursts at this small scale: the whole frame is a few ms,
        # so the marginal needs more samples to clear the weather floor
        p, b, bl, t_120 = _stage_deltas(s120, camera, cfg120, mt120, t_disp,
                                        iters=(10, 40))
        if t_120 > 0.0:
            R["frame_120k_1080p_ms"] = round(t_120 * 1e3, 3)
            R["frame_120k_minus_dispatch_ms"] = round(
                max(t_120 - t_disp, 0.0) * 1e3, 3)
        else:
            # below the marginal method's floor — publish the burst-mean
            # UPPER BOUND instead of an impossible 0.0
            tb, _ = time_fn(jax.jit(lambda s, c: render_splats(
                s, c, cfg120, "pallas", BLOCK, blend_max_blocks=mt120,
                blend_kernel="tile")), s120, camera, warmup=1, iters=10)
            R["frame_120k_1080p_upper_ms"] = round(tb * 1e3, 3)
        # At 120k the true stage times approach the interleaved-minima
        # noise band (~0.5 ms); a delta below it is NOT a measurement —
        # it goes in below_floor, never an impossible 0.0 (BENCH_r04
        # shipped stage_bin_120k_ms: 0.0; VERDICT r4 item 4)
        for name, sec in (("project", p), ("bin", b), ("blend", bl)):
            _emit_ms(R, f"stage_{name}_120k_ms", sec, floor_ms=0.5)
        # the one config with reference per-stage numbers to compare
        # against: GPU_PIPELINE_PLAN.md:533-546's "After" GPU-only estimate
        # (5.8 ms total; project 0.2 + keys/sort/bin 2.9 + render 2.0 +
        # readback overlap).  Our frame carries the relay's fixed dispatch
        # cost (dispatch_overhead_ms) the estimate excludes — the
        # device-only equivalent is frame - dispatch.
        R["ref_120k_gpu_estimate_ms"] = 5.8

    H.step("ref_120k", 120, step_120k)

    # ---- step 7: stress: 10M splats @1080p exact fused frame (the
    # reference's stretch target, 3D_PLAN.md:379-382 "10M @ 30+ FPS", never
    # demonstrated there; full sweep in benchmarks/probe_stress.py) ----
    def step_10m():
        r10 = rcfg.replace(base_radius=0.008 * float(np.sqrt(0.1)))
        s10m = jax.jit(lambda p, k: model_points(scene, p, k, 10_000_000, pcfg,
                                                 r10))(params, key)
        d10m = jax.jit(lambda s, c: splat_screen_data(s, c, r10))(s10m, camera)
        mb10 = _capacity_class(d10m, r10)
        t_10m, img10 = time_fn_sustained(
            jax.jit(lambda s, c: render_splats(s, c, r10, "pallas", BLOCK,
                                               blend_max_blocks=mb10)),
            s10m, camera, iters_short=1, iters_long=3, bursts=2, warmup=1,
        )
        if not np.isfinite(np.asarray(jax.device_get(img10))).all():
            raise ValueError("10M stress frame has non-finite pixels")
        _emit_ms(R, "stress_10m_ms", t_10m)

    H.step("stress_10m", 150, step_10m)

    # ---- step 8: config 4 — 500k animated over 120 frames ----
    def step_animated():
        d500 = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(
            jax.jit(lambda p, k: model_points(scene, p, k, 500_000, pcfg, rcfg))(
                params, key
            ),
            camera,
        )
        mb500 = _capacity_class(d500, rcfg)

        def animated(p, c, k):
            s = model_points(scene, p, k, 500_000, pcfg, rcfg)
            d = splat_screen_data(s, c, rcfg)
            return render_tiles_pallas(d, None, rcfg, block=BLOCK, max_blocks=mb500)

        anim_j = jax.jit(animated)
        t_anim, _ = time_fn_sustained(anim_j, params, camera, key,
                                      iters_short=5, iters_long=20, bursts=3)
        _emit_ms(R, "animated_frame_ms_500k", t_anim)

        # the honest 120-frame sequence: animate primitive params + orbit
        # the camera every frame, host loop included (BASELINE config 4)
        acam = spt.Camera(aspect=WIDTH / HEIGHT)
        out = None
        t0 = time.perf_counter()
        for i in range(120):
            t = i / 60.0
            scene["sphere2"].position[1] = 0.6 + 0.2 * np.sin(2 * np.pi * t)
            acam.azimuth = 0.5 + 0.02 * i
            c_i = {k_: jnp.asarray(v) for k_, v in acam.arrays(t).items()}
            out = anim_j(scene.params(), c_i, jax.random.fold_in(key, i))
        jax.device_get(out.ravel()[:1])
        t_seq = time.perf_counter() - t0
        scene["sphere2"].position[1] = 0.6  # restore
        R["animated_120f_s"] = round(t_seq, 3)
        R["animated_120f_fps"] = round(120.0 / t_seq, 2)
        S["mb500"] = mb500

    H.step("animated", 120, step_animated)

    # ---- step 9: ...and the fused form: all 120 frames in ONE lax.scan
    # program (render/sequence.py) — the TPU datagen mode, zero host round
    # trips.  Separate step: its compile is the largest in the bench. ----
    def step_anim_scan():
        from splat_renderer_tpu.render.sequence import render_sequence

        acam2 = spt.Camera(aspect=WIDTH / HEIGHT)
        cam_list, par_list = [], []
        for i in range(120):
            t = i / 60.0
            scene["sphere2"].position[1] = 0.6 + 0.2 * np.sin(2 * np.pi * t)
            acam2.azimuth = 0.5 + 0.02 * i
            cam_list.append({k_: jnp.asarray(v)
                             for k_, v in acam2.arrays(t).items()})
            par_list.append(scene.params())
        scene["sphere2"].position[1] = 0.6
        cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cam_list)
        par_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *par_list)
        seq_j = jax.jit(
            lambda p, c, k: render_sequence(
                scene, p, c, k, 500_000, pcfg, rcfg, "pallas",
                blend_max_blocks=S["mb500"],
            )
        )
        t_scan, _ = time_fn_best(seq_j, par_stack, cam_stack, key, warmup=1,
                                 iters=2, bursts=3)
        R["animated_120f_scan_s"] = round(t_scan, 3)
        R["animated_120f_scan_fps"] = round(120.0 / t_scan, 2)

    H.step("animated_scan", 150, step_anim_scan)

    # ---- step 10: inverse rendering: one fit step (value_and_grad through
    # the custom-VJP Pallas diff path, render/diff.py method="pallas") at
    # 200k @512^2 — the training-speed metric ----
    def step_fit():
        from splat_renderer_tpu.render import render_diff

        fcfg = RenderConfig(width=512, height=512, base_radius=0.008,
                            tiles_per_splat_cap=4)
        fs = jax.jit(lambda p, k: model_points(scene, p, k, 200_000, pcfg, fcfg))(
            params, key
        )
        fcam = {k_: jnp.asarray(v) for k_, v in
                spt.Camera(aspect=1.0).arrays().items()}
        ftarget = jax.jit(
            lambda s: render_diff(s, fcam, fcfg, method="pallas")
        )(fs)
        ftheta = {k_: jnp.full_like(fs[k_], 0.5)
                  for k_ in ("cr", "cg", "cb", "opacity")}

        @jax.jit
        def fit_step(theta, s, target):
            def loss(t):
                img = render_diff(dict(s, **t), fcam, fcfg, method="pallas")
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(theta)

        t_fit, _ = time_fn_sustained(fit_step, ftheta, fs, ftarget,
                                     iters_short=3, iters_long=12, warmup=1)
        _emit_ms(R, "fit_step_200k_512_ms", t_fit)

    H.step("fit_step", 120, step_fit)

    # ---- step 10b: training QUALITY on the scoreboard (VERDICT r4 item
    # 6): a short multi-view re-fit through the custom-VJP Pallas kernel
    # pair with density control ON, scored by held-out PSNR computed ON
    # HOST with range asserts — guards ops/tile_blend_diff.py against
    # silent gradient regressions at the scoreboard level (the full
    # experiment is benchmarks/fit_quality.py). ----
    def step_fit_quality():
        from splat_renderer_tpu import fit
        from splat_renderer_tpu.render.diff import render_diff

        # 6 views with alternating elevation: 3-view fits OVERFIT — the
        # held-out PSNR DEGRADED (24.4 -> 19.7 at lr 1e-2, and the
        # fit_quality.py ablation's own 3-view config also degrades on
        # device: 22.9 -> 20.0) while train loss fell.  6 views constrain
        # the 8-field geometry fit; measured on device: 22.55 -> 31.84 dB
        # at lr 2e-3 / 60 steps / densify_every 20.
        qn, qres, qsteps = 10_000, 256, 60
        qcfg = RenderConfig(width=qres, height=qres, base_radius=0.03,
                            tiles_per_splat_cap=9)
        qsplats = jax.jit(lambda p, k: model_points(
            scene, p, k, qn, PointConfig(), qcfg))(params, key)

        def cam_at(az, el=0.3):
            c = spt.Camera(azimuth=az, elevation=el, aspect=1.0)
            return {k_: jnp.asarray(v) for k_, v in c.arrays().items()}

        qcams = [cam_at(0.4 + 2 * np.pi * v / 6, 0.3 if v % 2 == 0 else 0.7)
                 for v in range(6)]
        held_out = cam_at(0.4 + np.pi / 6, 0.5)
        render_q = jax.jit(
            lambda s, c: render_diff(s, c, qcfg, method="pallas"))
        qtargets = [render_q(qsplats, c) for c in qcams]
        truth = np.asarray(jax.device_get(render_q(qsplats, held_out)))

        # degraded start: half the splats dead — density control (clone +
        # split) must reclaim the free slots to close the coverage holes
        kill = np.zeros(qn, bool)
        kill[np.random.default_rng(7).choice(qn, qn // 2,
                                             replace=False)] = True
        kj = jnp.asarray(kill)
        degraded = dict(
            qsplats,
            radius=jnp.where(kj, 0.0, qsplats["radius"]),
            opacity=jnp.where(kj, 0.0, qsplats["opacity"]),
        )
        fitted, _losses = fit.fit_splats(
            degraded, qcams, qtargets, qcfg,
            fields=("px", "py", "pz", "radius", "opacity",
                    "cr", "cg", "cb"),
            steps=qsteps, lr=2e-3, method="pallas",
            densify_every=qsteps // 3, densify_threshold=1e-7,
        )
        img = np.asarray(jax.device_get(render_q(fitted, held_out)))
        # host-side quality with range asserts — never a device scalar
        # (the BENCH_r02 ssim=1.23 lesson, utils/ssim.quality_gate)
        mse = float(np.mean((img - truth) ** 2))
        mse0_arr = np.asarray(jax.device_get(render_q(degraded, held_out)))
        mse0 = float(np.mean((mse0_arr - truth) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        psnr0 = -10.0 * np.log10(max(mse0, 1e-12))
        assert 0.0 < psnr < 80.0, f"fit PSNR out of range: {psnr}"
        assert psnr > psnr0 + 3.0, (
            f"fit did not improve held-out PSNR: {psnr0:.2f} -> {psnr:.2f}"
        )
        R["fit_psnr_held_out_db"] = round(psnr, 2)
        R["fit_psnr_degraded_init_db"] = round(psnr0, 2)

    H.step("fit_quality", 180, step_fit_quality)

    # ---- step 11: config 1 (oracle 10k @256^2) + config 2 (100k @720p) ----
    def step_small_configs():
        from splat_renderer_tpu.render.oracle import render_oracle

        ocfg = RenderConfig(width=256, height=256, base_radius=0.03)
        o_splats = jax.jit(
            lambda p, k: model_points(scene, p, k, 10_000, pcfg, ocfg))(params, key)
        ocam = {k_: jnp.asarray(v)
                for k_, v in spt.Camera(aspect=1.0).arrays().items()}
        t_oracle, _ = time_fn_sustained(
            jax.jit(lambda s, c: render_oracle(splat_screen_data(s, c, ocfg), ocfg)),
            o_splats, ocam, iters_short=2, iters_long=8, bursts=2, warmup=1,
        )
        _emit_ms(R, "oracle_10k_256_ms", t_oracle)

        cfg720 = RenderConfig(width=1280, height=720, base_radius=0.02,
                              tiles_per_splat_cap=4)
        s100k = jax.jit(
            lambda p, k: model_points(scene, p, k, 100_000, pcfg, cfg720))(
            params, key)
        cam720 = {k_: jnp.asarray(v) for k_, v in
                  spt.Camera(aspect=1280 / 720).arrays().items()}
        d720 = jax.jit(lambda s, c: splat_screen_data(s, c, cfg720))(s100k, cam720)
        mb720 = _capacity_class(d720, cfg720)
        t_720, _ = time_fn_sustained(
            jax.jit(lambda s, c: render_tiles_pallas(
                splat_screen_data(s, c, cfg720), None, cfg720, block=BLOCK,
                max_blocks=mb720)),
            s100k, cam720, iters_short=5, iters_long=20,
        )
        _emit_ms(R, "frame_720p_100k_ms", t_720)

    H.step("small_configs", 120, step_small_configs)

    # ---- step 12: SH-lit frame (render/sh.py): degree-3 view-dependent
    # color at 1M + the fast_math profile, both on the ts16 pipeline ----
    def step_sh_fast():
        from splat_renderer_tpu.render.sh import apply_sh

        splats, mt = S["splats"], S["mt"]
        sh_rng = np.random.default_rng(5)
        sh = {c: jnp.asarray(sh_rng.normal(scale=0.1, size=(15, N_SPLATS))
                             .astype(np.float32)) for c in ("r", "g", "b")}

        def full_sh(s, sh_, c):
            return render_splats(apply_sh(s, sh_, c["cam_pos"]), c, rcfg,
                                 "pallas", BLOCK, blend_max_blocks=mt,
                                 blend_kernel="tile")

        t_sh, _ = time_fn_sustained(jax.jit(full_sh), splats, sh, camera,
                                    iters_short=5, iters_long=20)
        _emit_ms(R, "frame_ms_sh_deg3", t_sh)

        # fast profile, RETUNED to the current frontier (VERDICT r4 item
        # 5): 32x16 tiles + class caps + the margin-1.3 support cut.  The
        # old fast measurement (ts16, margin 1.5) was 4 ms SLOWER than the
        # exact headline because it never picked up the round-3 tile
        # geometry; and at 32x16 the exact profile already fits the fused
        # nk1 pair key (12 tile bits + 20 rank bits = 32), so fast_math's
        # coarse-rank fusing is a no-op — the margin cut (smaller binning
        # footprints -> fewer pair rows) is the profile's real lever.
        rcfg_fast = rcfg32.replace(fast_math=True, bounds_margin=1.3)
        bfast = jax.jit(lambda s, c: bin_splats_packed(
            splat_screen_data(s, c, rcfg_fast), rcfg_fast, BLOCK))(
            splats, camera)
        mtf = int(np.asarray(bfast["tiles_used"]) * 1.15) + 8
        n_hi_f, n_mid_f = (int(x) for x in np.asarray(bfast["class_counts"]))
        ccf = _class_caps(n_hi_f, n_mid_f, N_SPLATS,
                          rcfg_fast.tiles_per_splat_cap)

        def full_fast(s, c):
            return render_splats(s, c, rcfg_fast, "pallas", BLOCK,
                                 blend_max_blocks=mtf, blend_kernel="tile",
                                 pair_class_caps=ccf)

        t_fast, img_fast = time_fn_sustained(
            jax.jit(full_fast), splats, camera, iters_short=5,
            iters_long=20)
        t_exact = R.get("frame_ms", 0.0) * 1e-3
        if t_fast * 1e3 < FLOOR_MS:
            R.setdefault("below_floor", []).append("frame_ms_fast")
        elif t_exact and t_fast >= t_exact:
            # an approximation that loses to exact is an anti-feature —
            # keep it off the scoreboard (VERDICT r4 item 5)
            R["fast_profile_retired"] = round(t_fast * 1e3, 3)
        else:
            R["frame_ms_fast"] = round(t_fast * 1e3, 3)
            R["fps_fast"] = round(1.0 / t_fast, 2)
            R["ssim_fast_vs_exact"] = round(quality_gate(
                jax.device_get(img_fast), jax.device_get(S["img_best"])), 5)

    H.step("sh_fast", 120, step_sh_fast)

    # ---- step 13: config 5 — 8 views x 2M splats @1080p, one fused
    # program; plus the reference's LIVE path (opaque oriented surface) ----
    def step_mv_surface():
        from splat_renderer_tpu.render import render_views

        s2m = jax.jit(lambda p, k: model_points(scene, p, k, 2_000_000, pcfg,
                                                rcfg))(params, key)
        cams8 = {k_: jnp.asarray(v) for k_, v in
                 spt.orbit_ring(8, aspect=WIDTH / HEIGHT).items()}
        d2m = jax.jit(lambda s, c: splat_screen_data(s, c, rcfg))(s2m, camera)
        mb2m = _capacity_class(d2m, rcfg)
        mv_j = jax.jit(
            lambda s, c: render_views(s, c, rcfg, "pallas", BLOCK,
                                      blend_max_blocks=mb2m, flat=True)
        )
        t_mv, _ = time_fn(mv_j, s2m, cams8, warmup=1, iters=3)
        R["multiview8_2m_ms"] = round(t_mv * 1e3, 3)

        # The reference's actual WIRED path (src/Renderer.ts:250-308):
        # opaque oriented surface quads.  Round-4 ran this through the
        # FLAT kernel with no class caps (the full-cap 4M-row pair sort the
        # headline long since eliminated) and it was the repo's slowest
        # number (42.4 ms, VERDICT r4 weak 4).  Now it gets the headline
        # machinery: tile-major kernel (saturated tiles stop DMAing —
        # opaque alpha=1 saturates transmittance after ONE covering
        # record), class-partitioned pair expansion when the census pays,
        # group=256.
        scfg = spt.surface_render_config(
            WIDTH, HEIGHT, base_radius=0.004, tiles_per_splat_cap=4
        )
        ssurf = jax.jit(lambda p, k: model_points(scene, p, k, N_SPLATS,
                                                  pcfg, scfg))(params, key)
        bsurf = jax.jit(lambda s, c: bin_splats_packed(
            splat_screen_data(s, c, scfg), scfg, BLOCK))(ssurf, camera)
        mts = int(np.asarray(bsurf["tiles_used"]) * 1.15) + 8
        n_hi_s, n_mid_s = (int(x) for x in np.asarray(bsurf["class_counts"]))
        ccs = _class_caps(n_hi_s, n_mid_s, N_SPLATS, scfg.tiles_per_splat_cap)

        # render-only from pre-modeled splats — the SAME convention as the
        # alpha headline (full32(splats, camera)); the with-model variant
        # (the full live-loop frame) is the secondary field.  BENCH_r04's
        # 42.4 ms was the with-model form AND the un-optimized config, so
        # the two rows below keep both comparisons honest.
        def surface(s, c):
            return render_splats(s, c, scfg, "pallas", BLOCK,
                                 blend_max_blocks=mts, blend_kernel="tile",
                                 pair_class_caps=ccs, return_stats=True)

        t_surf, (_, st_s) = time_fn_sustained(
            jax.jit(surface), ssurf, camera, iters_short=5, iters_long=20)
        if ccs is not None and bool(np.asarray(st_s["class_overflow"])):
            ccs = None
            t_surf, _ = time_fn_sustained(
                jax.jit(surface), ssurf, camera, iters_short=5,
                iters_long=20)
        t_surf_m, _ = time_fn_sustained(
            jax.jit(lambda p, c, k: render_splats(
                model_points(scene, p, k, N_SPLATS, pcfg, scfg), c, scfg,
                "pallas", BLOCK, blend_max_blocks=mts, blend_kernel="tile",
                pair_class_caps=ccs)),
            params, camera, key, iters_short=5, iters_long=20)
        _emit_ms(R, "surface_opaque_frame_ms_1m", t_surf)
        _emit_ms(R, "surface_opaque_with_model_ms_1m", t_surf_m)
        R["surface_opaque_class_caps"] = list(ccs) if ccs else []

    H.step("mv_surface", 150, step_mv_surface)

    # ---- step 14: radius-cap stats (the capacity clamp the reference
    # merely warns about, src/GPUTileBinner.ts:265-281) ----
    def step_radius_stats():
        proj = jax.jit(
            lambda s, c: project_planes(
                c["view_proj"], c["cam_pos"], s["px"], s["py"], s["pz"],
                s["radius"], rcfg,
            )
        )(S["splats"], camera)
        r_raw = np.asarray(proj["radius_raw"])
        R["radius_clamped_frac"] = round(float((r_raw > rcfg.r_cap).mean()), 5)
        R["radius_raw_max_px"] = round(float(r_raw.max()), 2)

    H.step("radius_stats", 40, step_radius_stats)

    # ---- step 15: SERVED viewer rate at 1M (VERDICT r3 item 4): the
    # pipelined HTTP server (viewer/serve.py, latest-wins render thread +
    # raw-RGB transport) must deliver within ~20% of the engine's own rate;
    # benchmarks/probe_viewer_fps.py is the asserting standalone form ----
    def step_viewer():
        import threading
        import urllib.error
        import urllib.request

        from splat_renderer_tpu.render.pipeline import SplatEngine
        from splat_renderer_tpu.viewer.serve import make_server

        from splat_renderer_tpu.utils.image import to_uint8_rows

        rcfg_v = spt.turbo_render_config(WIDTH, HEIGHT, base_radius=0.008,
                                         tiles_per_splat_cap=4)
        # stats_every=8: the capacity-stats read is a full relay barrier
        # per frame; a serving loop only needs it every few frames
        eng = SplatEngine(S["splats"], rcfg_v, stats_every=8)
        vcam = spt.Camera(aspect=WIDTH / HEIGHT)

        def cam_arrays(az):
            vcam.azimuth = az
            return {k_: jnp.asarray(v) for k_, v in vcam.arrays().items()}

        # Comparators for the served rate:
        #  - viewer_engine_fps: the engine's SUSTAINED render rate (no
        #    readback) — what the render thread can produce;
        #  - viewer_fetch_mb_s: device->host throughput on FRESH u8
        #    frames (a repeat fetch of the same array hits jax's host
        #    cache and reads tens of GB/s — measure distinct frames);
        #  - viewer_transfer_ceiling_fps: fetch rate / frame bytes — the
        #    transport bound no server design can beat.  Over the relay
        #    this ceiling (~1-4 FPS at 6 MB/frame) is FAR below the
        #    engine rate; on a local TPU host (PCIe GB/s) it is not.
        # The served criterion is therefore served ≈ min(engine, ceiling),
        # reported as viewer_served_over_achievable.
        u8 = jax.jit(to_uint8_rows)
        eng_frame = eng.frame  # includes the stats fetch (engine protocol)
        np.asarray(u8(eng_frame(cam_arrays(0.0), jax.random.PRNGKey(0))))
        t_eng, _ = time_fn_sustained(
            lambda c, k: eng_frame(c, k), cam_arrays(0.1),
            jax.random.PRNGKey(1), iters_short=3, iters_long=10, bursts=2,
            warmup=1)
        engine_fps = 1.0 / max(t_eng, 1e-9)
        frames_u8 = [u8(eng_frame(cam_arrays(0.2 + 0.01 * i),
                                  jax.random.PRNGKey(10 + i)))
                     for i in range(3)]
        jax.device_get(frames_u8[-1].ravel()[:1])  # ensure all complete
        best_fetch = float("inf")
        nbytes = frames_u8[0].size * frames_u8[0].dtype.itemsize
        for fr in frames_u8:
            t0 = time.perf_counter()
            np.asarray(fr)
            best_fetch = min(best_fetch, time.perf_counter() - t0)
        fetch_mb_s = nbytes / 1e6 / max(best_fetch, 1e-9)
        ceiling_fps = fetch_mb_s * 1e6 / nbytes
        R["viewer_fetch_mb_s"] = round(fetch_mb_s, 2)
        R["viewer_transfer_ceiling_fps"] = round(ceiling_fps, 2)

        # profile_stages=False: the HUD's one-off P1/P2/P3 stage compile
        # must not contend with the frames being timed (ADVICE r4 medium)
        httpd = make_server(eng, port=0, profile_stages=False)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}/frame"

        def fetch(az, seq, budget_s=150.0):
            """One served frame, 503-tolerant: the latest-wins server's
            503 means "no fresh frame inside MY 30 s wait — ask again"
            (viewer/serve.py), not "dead".  BENCH_r04's viewer step died
            on its first 503 after burning 201 s (VERDICT r4 item 2)."""
            deadline = time.monotonic() + budget_s
            delay = 0.5
            while True:
                try:
                    with urllib.request.urlopen(
                        f"{base}?az={az}&seq={seq}&raw=1", timeout=120
                    ) as r:
                        new_seq = int(r.headers.get("x-seq", str(seq)))
                        body = r.read()
                    if len(body) != WIDTH * HEIGHT * 3:
                        raise ValueError(
                            f"short frame body: {len(body)} bytes")
                    return new_seq
                except urllib.error.HTTPError as e:
                    if e.code != 503 or time.monotonic() > deadline:
                        raise
                    time.sleep(delay)
                    delay = min(delay * 2, 8.0)

        try:
            # pre-warm the serving path (first frame may recompile at the
            # engine's adopted capacity class) before any timed request
            seq = fetch(0.5, 0)
            seq = fetch(0.505, seq)
            # TWO concurrent request workers (pipeline depth 2): a single-
            # inflight client serializes render with the fetch, capping
            # served at 1/(render+fetch); with one request in flight while
            # the other's transfer streams, the server's render/transfer
            # threads overlap and served approaches the transfer ceiling
            frames = 30
            shared = {"seq": seq, "az": 0.51}
            got_seqs: set = set()
            lk = threading.Lock()

            worker_errs: list = []

            def worker(n):
                try:
                    for _ in range(n):
                        with lk:
                            shared["az"] += 0.005
                            az, s = shared["az"], shared["seq"]
                        s2 = fetch(az, s, budget_s=60.0)
                        with lk:
                            shared["seq"] = max(shared["seq"], s2)
                            got_seqs.add(s2)
                except Exception as e:  # surfaced after join — a dead
                    worker_errs.append(e)  # worker must FAIL the step,
                    # never deflate served_fps silently

            t0 = time.perf_counter()
            ws = [threading.Thread(target=worker, args=(frames // 2,))
                  for _ in range(2)]
            for w_ in ws:
                w_.start()
            for w_ in ws:
                w_.join()
            if worker_errs:
                raise worker_errs[0]
            if not got_seqs:
                raise RuntimeError("viewer workers fetched no frames")
            # DISTINCT frames only: with latest-wins, two concurrent
            # requests can legitimately receive the same frame — counting
            # responses would overstate the stream rate
            served_fps = len(got_seqs) / (time.perf_counter() - t0)
        finally:
            httpd.shutdown()
            if getattr(httpd, "render_loop", None):
                httpd.render_loop.stop()
        achievable = min(engine_fps, ceiling_fps)
        R["viewer_engine_fps"] = round(engine_fps, 2)
        R["viewer_served_fps"] = round(served_fps, 2)
        R["viewer_served_over_achievable"] = round(
            served_fps / max(achievable, 1e-9), 3)

    H.step("viewer_served", 120, step_viewer)

    # ---- flat-kernel A/B at ts16 (kernel-variant delta; lowest value) ----
    def step_flat_kernel():
        splats = S["splats"]
        data = S["data"]
        binned = jax.jit(lambda d: bin_splats_packed(d, rcfg, BLOCK))(data)
        blocks_used = int(np.asarray(binned["block_off"])[-1])
        mb = max(1024, -(-int(blocks_used * 1.25) // 1024) * 1024)

        def full_flat(s, c):
            return render_splats(s, c, rcfg, "pallas", BLOCK,
                                 blend_max_blocks=mb)

        t_flat, _ = time_fn_sustained(jax.jit(full_flat), splats, camera,
                                      iters_short=5, iters_long=20)
        _emit_ms(R, "frame_ms_flat_kernel", t_flat)

    H.step("flat_kernel", 90, step_flat_kernel)

    # ---- emit ----
    # snapshot under retry: an abandoned-but-still-running step thread may
    # legitimately write its fields while we serialize
    fields_now = None
    for _ in range(5):
        try:
            fields_now = dict(R)
            break
        except RuntimeError:
            time.sleep(0.1)
    if fields_now is None:
        # all 5 snapshots raced a mutating abandoned thread; keep trying
        # longer (list(R)/dict(R) can BOTH raise under concurrent writes
        # — neither is atomic), and if the dict never settles emit a
        # marker record: SOME JSON always goes out (ADVICE r4)
        for _ in range(50):
            try:
                fields_now = dict(R)
                break
            except RuntimeError:
                time.sleep(0.05)
        else:
            fields_now = {"snapshot_failed": True}
    result = {
        "metric": "fps_1080p_1m_splats",
        "unit": "fps",
        **fields_now,
        "timing_fps_metrics": (
            "sustained_marginal(iters 5/20, min of 3 rounds) — cancels the"
            " relay's ~26 ms per-burst barrier; frame_ms_burst5 keeps the"
            " old burst-mean estimator for cross-round continuity"
        ),
        "timing_stage_metrics": (
            "interleaved sustained_marginal(5/20) deltas; per-dispatch cost"
            " from relay_cost_model subtracted from P1"
        ),
        "budget_s": budget,
        "elapsed_s": round(H.elapsed(), 1),
        "step_s": H.step_s,
        "skipped": H.skipped,
        "errors": H.errors,
        "contaminated": H.contaminated,
        "n_splats": N_SPLATS,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "device": str(jax.devices()[0]),
    }
    if H.hung_step is not None:
        result["hung_step"] = H.hung_step
    H.log(f"emitting JSON ({len(H.skipped)} skipped, {len(H.errors)} errors)")
    print(json.dumps(result))
    if H.hung_step is not None:
        # a wedged relay future is stuck in a daemon thread; JAX's atexit
        # device sync could hang interpreter shutdown past the driver's
        # timeout — the JSON is out, leave without ceremony
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


def _capture_score(rec: dict | None):
    """Ranking for inner captures: headline first, then FEWER failed or
    skipped steps, then calmer weather (lower measured barrier), then
    more fields — a capture whose targeted metrics actually landed beats
    one that merely has the headline (VERDICT r4: BENCH_r04 scored 'full
    healthy' while viewer_served had errored)."""
    if rec is None:
        return (-2, 0, 0, -1)
    degraded = len(rec.get("errors", {})) + len(rec.get("skipped", []))
    barrier = rec.get("relay_barrier_ms", 0.0)
    return (1 if "value" in rec else 0, -degraded, -barrier, len(rec))


def _capture_healthy(rec: dict | None) -> bool:
    """A capture that stops the outer retry loop: headline present, no
    hung step, EVERY step ran clean (no errors, no budget skips), and the
    weather was sane (one run measured barrier 138 ms during a stall
    window — its stage split was garbage; retry while budget remains)."""
    return (
        rec is not None and "value" in rec and "hung_step" not in rec
        and not rec.get("errors") and not rec.get("skipped")
        and rec.get("relay_barrier_ms", 0.0) < 60.0
    )


def outer_main() -> None:
    """Outage-resilient wrapper: the driver invokes bench.py exactly once,
    but the relay can be wedged AT THAT MOMENT (observed round 4: a
    multi-hour outage window with transient recoveries).  The outer
    process never touches the device; it spawns inner attempts
    (BENCH_INNER=1 -> main()) and emits the most complete capture.  A
    fresh process also side-steps a wedged in-process runtime — an
    in-process retry would reuse the stuck backend.

    Scoring: a capture with the headline beats any without; ties break on
    field count.  A healthy full run (value present, no hung_step) stops
    immediately; a partial capture retries while the outer budget allows."""
    import subprocess

    outer_budget = float(os.environ.get("BENCH_OUTER_BUDGET_S", "1700"))
    inner_default = float(os.environ.get("BENCH_BUDGET_S", "1080"))
    t0 = time.perf_counter()

    def log(msg: str) -> None:
        print(f"[bench-outer t={time.perf_counter() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    score = _capture_score
    best: dict | None = None
    last_stderr_tail = ""
    attempt = 0
    while True:
        remaining = outer_budget - (time.perf_counter() - t0)
        if remaining < 420:  # not enough for a meaningful inner attempt
            break
        attempt += 1
        inner_budget = min(inner_default, remaining - 120)
        env = dict(os.environ,
                   BENCH_INNER="1", BENCH_BUDGET_S=str(inner_budget))
        log(f"attempt {attempt} (inner budget {inner_budget:.0f}s)")
        rec = None
        tail: list = []  # last stderr lines, live-teed by the pump thread

        def pump(stream):
            # tee the inner's progress to OUR stderr line-by-line (live
            # diagnosability) while keeping a bounded tail for the artifact
            for raw in iter(stream.readline, b""):
                sys.stderr.buffer.write(raw)
                sys.stderr.flush()
                tail.append(raw.decode(errors="replace"))
                del tail[:-40]

        try:
            import threading

            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
            pt = threading.Thread(target=pump, args=(proc.stderr,),
                                  daemon=True)
            pt.start()
            # hard-timeout enforcement without communicate() (the stderr
            # pipe is owned by the pump thread): a timer kills the inner
            # process, which EOFs stdout and unblocks the read below
            killed = []
            timer = threading.Timer(
                inner_budget + 360,
                lambda: (killed.append(True), proc.kill()))
            timer.start()
            out = proc.stdout.read()
            proc.wait()
            timer.cancel()
            pt.join(timeout=5)
            if killed:
                log(f"attempt {attempt}: inner exceeded hard timeout, killed")
            lines = out.decode().strip().splitlines()
            if lines:
                rec = json.loads(lines[-1])
        except Exception as e:
            log(f"attempt {attempt}: {type(e).__name__}: {e}")
        if tail:
            last_stderr_tail = "".join(tail)[-2000:]
        if score(rec) > score(best):
            best = rec
        if _capture_healthy(rec):
            log(f"attempt {attempt}: full healthy capture")
            break
        if rec is not None and "value" in rec:
            log(f"attempt {attempt}: headline captured but run degraded "
                f"(hung={rec.get('hung_step')} "
                f"errors={list(rec.get('errors', {}))} "
                f"skipped={rec.get('skipped')}); retrying for a fuller one")
        else:
            log(f"attempt {attempt}: no headline (relay outage?); retrying")
        time.sleep(90)
    if best is None:
        best = {
            "metric": "fps_1080p_1m_splats", "unit": "fps",
            "error": "no inner bench attempt produced JSON "
                     "(relay outage for the whole window?)",
            "attempts": attempt,
            "elapsed_s": round(time.perf_counter() - t0, 1),
        }
    if "value" not in best and last_stderr_tail:
        # a headline-less artifact must carry its own diagnosis: the last
        # inner attempt's stderr tail says where the run died (VERDICT r4
        # item 8)
        best["last_attempt_stderr_tail"] = last_stderr_tail
    best["outer_attempts"] = attempt
    print(json.dumps(best))


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER"):
        main()
    else:
        outer_main()
