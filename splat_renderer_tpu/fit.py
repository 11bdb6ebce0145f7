"""Inverse rendering: fit splat fields to target images by gradient descent.

The library API over render/diff.py — a miniature 3DGS-style optimization
loop (Kerbl et al. 2023's appearance/geometry fitting, minus adaptive
density control).  No counterpart exists in the WebGPU reference (its
pipeline is forward-only WGSL); `fit_demo.py` is the CLI showcase.

Design notes (all measured, see CLAUDE.md):
- One jitted step; `splats` and `targets` are jit ARGUMENTS, never closure
  captures — image-sized array constants baked into a large program return a
  wrong scalar loss over the axon relay.
- method="pallas" uses the custom-VJP kernel pair (ops/tile_blend_diff.py),
  the training-speed path; "tiles"/"oracle" are the XLA references.
- Multi-view: the loss averages over the views; each view renders inside the
  same jitted step (unrolled — view counts are small).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .points.properties import Splats
from .render.diff import CameraArrays, render_diff
from .render.sh import apply_sh

FIT_FIELDS_APPEARANCE = ("cr", "cg", "cb", "opacity")
FIT_FIELDS_GEOMETRY = ("px", "py", "pz", "radius")


def render_targets(
    splats: Splats,
    cameras: Sequence[CameraArrays],
    cfg: RenderConfig,
    method: str = "pallas",
    sh=None,
) -> Tuple[jnp.ndarray, ...]:
    """Render one target image per camera with the diff path (for synthetic
    fitting experiments / tests).  `sh` lights each view through
    render.sh.apply_sh (view-dependent color)."""

    def one(s, c, sh_):
        s = apply_sh(s, sh_, c["cam_pos"]) if sh_ is not None else s
        return render_diff(s, c, cfg, method=method)

    f = jax.jit(one)
    return tuple(f(splats, cam, sh) for cam in cameras)


DENSIFY_FIELDS = ("px", "py", "pz", "radius", "opacity")


def fit_splats(
    splats: Splats,
    cameras: Sequence[CameraArrays],
    targets: Sequence[jnp.ndarray],
    cfg: RenderConfig,
    fields: Sequence[str] = FIT_FIELDS_APPEARANCE,
    steps: int = 100,
    lr: float = 3e-2,
    method: str = "pallas",
    loss: str = "l2",
    init: Optional[Dict[str, jnp.ndarray]] = None,
    log_every: int = 0,
    densify_every: int = 0,
    densify_threshold: float = 1e-5,
    prune_opacity: float = 0.005,
    clone_radius: Optional[float] = None,
    opacity_reset_every: int = 0,
    opacity_reset_value: float = 0.01,
    key: Optional[jax.Array] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    sh=None,
    fit_sh: bool = False,
    depth_targets: Optional[Sequence[jnp.ndarray]] = None,
    depth_weight: float = 0.2,
):
    """Optimize `fields` of `splats` so renders match `targets` (Adam).

    `loss` selects the objective (utils/ssim.py registry): "l2" (MSE, the
    default), "l1", or "ssim" — the 3DGS-standard (1-lam)*L1 + lam*(1-SSIM)
    mix (Kerbl et al. 2023 sec. 3).

    cameras/targets are parallel sequences (multi-view joint fit).  `init`
    overrides the starting value per field (default: the current values in
    `splats` — pass e.g. gray planes to re-fit appearance from scratch).

    densify_every > 0 enables 3DGS adaptive density control (density_control)
    every that many steps: splats whose ACCUMULATED positional-gradient
    magnitude exceeds densify_threshold reproduce into freed capacity
    (pruned low-opacity slots) — small candidates CLONE at full size, large
    ones SPLIT with both halves shrunk (the Kerbl sec. 5.2 under-/over-
    reconstruction regimes; boundary `clone_radius`, None = live-radius
    mean); requires px/py/pz/radius/opacity in `fields` and resets the Adam
    state at each event (the population changed).

    opacity_reset_every > 0 additionally clamps every live opacity DOWN to
    opacity_reset_value every that many steps (Kerbl sec. 5.2's periodic
    reset): splats the optimizer does not pull back up within the next
    densify interval fall under prune_opacity and die — the mechanism that
    clears accumulated floaters near the camera and lets density control
    escape local minima in long fits.  Resets the Adam state at the event
    (the parameter jumped), like densify events do.

    checkpoint_path + checkpoint_every > 0 write the FULL training state
    (theta, Adam moments, splats, densify score, RNG key, step, loss curve)
    to one .npz every that many steps (utils/snapshot.save_pytree);
    resume=True restarts from the file if it exists — the resumed run is
    step-for-step identical to the uninterrupted one (Adam is deterministic;
    tests/test_fit.py::TestFitCheckpoint asserts bitwise equality).

    View-dependent color: `sh` (the ``{"r"|"g"|"b": (n_rest, N)}`` pytree,
    render/sh.py) lights every view via apply_sh before rendering.
    `fit_sh=True` additionally OPTIMIZES the coefficients — real 3DGS-style
    appearance training (gradients flow through the SH basis; the final
    clip's upper bound zeroes gradients only for saturated pixels, matching
    3DGS's clamp-at-0 convention on the other side).  With `fit_sh` the
    return is (splats, losses, fitted_sh); `sh=None, fit_sh=True` is an
    error (pass the zero-initialized coefficient pytree of the degree you
    want).  Density control reallocates the coefficients alongside the
    splats (density_control's `sh` path).

    Depth supervision (RGB-D fitting): `depth_targets` is a per-view
    sequence of (H, W) expected-depth maps (0 = background — exactly what
    datagen --gbuffer writes and data.load_dataset(gbuffer=True) returns).
    The objective gains depth_weight * mean_{target depth > 0} |d - d*|
    per view, rendered through render_diff_gbuffer — depth constrains the
    along-ray direction a color loss barely sees.  Runs at full training
    speed with method="pallas": the custom-VJP kernel pair carries the
    expected-depth channel forward AND backward (ops/tile_blend_diff.py);
    method="tiles" remains the any-profile fallback.

    Returns (splats with fitted fields, (steps,) loss curve)
    [+ fitted sh if fit_sh].
    """
    if len(cameras) != len(targets):
        raise ValueError("cameras and targets must pair up")
    if depth_targets is not None:
        if len(depth_targets) != len(cameras):
            raise ValueError("depth_targets must pair up with cameras")
        if method == "oracle":
            raise ValueError(
                "depth supervision renders the G-buffer — use "
                "method='pallas' (training grade) or 'tiles'"
            )
    if not fields and not fit_sh:
        raise ValueError("nothing to fit: fields is empty")
    if fit_sh and sh is None:
        raise ValueError("fit_sh=True needs an initial sh coefficient pytree")
    if densify_every and not set(DENSIFY_FIELDS) <= set(fields):
        raise ValueError(
            f"densify_every needs fields to include {DENSIFY_FIELDS}"
        )
    import optax

    from .utils.ssim import image_loss

    loss_img = image_loss(loss)
    theta = {k: (init[k] if init and k in init else splats[k]) for k in fields}
    if fit_sh:
        # "sh:" prefix keeps coefficient rows distinct from splat planes in
        # the one flat theta dict (checkpoints stay key-path addressable)
        theta.update({f"sh:{c}": sh[c] for c in ("r", "g", "b")})
    opt = optax.adam(lr)
    opt_state = opt.init(theta)
    targets = tuple(targets)
    dtargets = tuple(depth_targets) if depth_targets is not None else None
    key = jax.random.PRNGKey(0) if key is None else key

    @jax.jit
    def step(theta, opt_state, splats, targets, sh_fixed, dtargets):
        def loss_fn(theta):
            s = dict(splats,
                     **{k: v for k, v in theta.items() if ":" not in k})
            sh_cur = (
                {c: theta[f"sh:{c}"] for c in ("r", "g", "b")}
                if fit_sh else sh_fixed
            )
            per_view = []
            for i, (cam, t) in enumerate(zip(cameras, targets)):
                s_v = (apply_sh(s, sh_cur, cam["cam_pos"])
                       if sh_cur is not None else s)
                if dtargets is not None:
                    from .render.diff import render_diff_gbuffer

                    gb = render_diff_gbuffer(s_v, cam, cfg, method=method)
                    l_v = loss_img(gb["rgb"], t)
                    dt = dtargets[i]
                    mask = (dt > 0.0).astype(jnp.float32)
                    l_v = l_v + depth_weight * jnp.sum(
                        jnp.abs(gb["depth"] - dt) * mask
                    ) / jnp.maximum(jnp.sum(mask), 1.0)
                else:
                    l_v = loss_img(render_diff(s_v, cam, cfg, method=method),
                                   t)
                per_view.append(l_v)
            return sum(per_view) / len(per_view)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        pos_g = (
            jnp.abs(grads["px"]) + jnp.abs(grads["py"]) + jnp.abs(grads["pz"])
            if densify_every
            else jnp.zeros(())
        )
        updates, opt_state = opt.update(grads, opt_state)
        return loss, optax.apply_updates(theta, updates), opt_state, pos_g

    from .utils.snapshot import checkpoint_file, load_pytree, save_pytree

    losses = []
    score = jnp.zeros(splats["radius"].shape if densify_every else ())
    start = 0
    # the relay miscompile rule (CLAUDE.md): sh is array-sized, so it rides
    # as a jit ARGUMENT (None when fit_sh — then it lives in theta).  It is
    # loop STATE too: densify events reallocate its columns.
    sh_fixed = None if fit_sh else sh
    ckpt_sh = sh_fixed is not None  # fixed coefficients are training state
    if checkpoint_path and resume:
        import os

        if os.path.exists(checkpoint_file(checkpoint_path)):
            try:
                tpl = {
                    "theta": theta, "opt_state": opt_state,
                    "splats": dict(splats), "score": score, "key": key,
                    "step": jnp.zeros((), jnp.int32),
                    "losses": jnp.zeros((0,)),
                }
                if ckpt_sh:
                    tpl["sh"] = dict(sh_fixed)
                st = load_pytree(checkpoint_path, tpl)
            except KeyError as e:
                raise ValueError(
                    f"checkpoint {checkpoint_path!r} is incompatible with "
                    f"this fit (different fields/loss/densify settings?): "
                    f"missing leaf {e}"
                ) from e
            # a stale checkpoint from a different run (other splat count,
            # other fields) must not silently hijack this one
            for k in theta:
                if st["theta"][k].shape != theta[k].shape:
                    raise ValueError(
                        f"checkpoint {checkpoint_path!r} is incompatible: "
                        f"theta[{k!r}] has shape {st['theta'][k].shape}, "
                        f"this fit needs {theta[k].shape}"
                    )
            start = int(st["step"])
            if start > steps:
                raise ValueError(
                    f"checkpoint {checkpoint_path!r} already holds {start} "
                    f"steps > requested steps={steps}; raise steps or start "
                    "fresh (resume=False)"
                )
            theta, opt_state = st["theta"], st["opt_state"]
            splats, score, key = st["splats"], st["score"], st["key"]
            losses = list(st["losses"])
            if ckpt_sh:
                sh_fixed = st["sh"]
    for i in range(start, steps):
        loss_val, theta, opt_state, pos_g = step(
            theta, opt_state, splats, targets, sh_fixed, dtargets
        )
        losses.append(loss_val)
        score = score + pos_g
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"fit step {i:4d}  {loss} {float(loss_val):.3e}")
        if densify_every and (i + 1) % densify_every == 0 and i + 1 < steps:
            key, sub = jax.random.split(key)
            theta_f = {k: v for k, v in theta.items() if ":" not in k}
            sh_cur = (
                {c: theta[f"sh:{c}"] for c in ("r", "g", "b")}
                if fit_sh else sh_fixed
            )
            if sh_cur is not None:
                merged, sh_new, stats = jax.jit(
                    functools.partial(density_control,
                                      clone_radius=clone_radius)
                )(
                    dict(splats, **theta_f), score / densify_every, sub,
                    densify_threshold, prune_opacity, sh=sh_cur,
                )
            else:
                merged, stats = jax.jit(
                    functools.partial(density_control,
                                      clone_radius=clone_radius)
                )(
                    dict(splats, **theta_f), score / densify_every, sub,
                    densify_threshold, prune_opacity,
                )
            splats = merged
            theta = {k: merged[k] for k in fields}
            if fit_sh:
                theta.update({f"sh:{c}": sh_new[c] for c in ("r", "g", "b")})
            elif sh_cur is not None:
                sh_fixed = sh_new
            opt_state = opt.init(theta)  # population changed: fresh moments
            score = jnp.zeros_like(score)
            if log_every:
                print(
                    f"  densify @{i + 1}: split {int(stats['split'])}, "
                    f"cloned {int(stats['cloned'])}, "
                    f"pruned {int(stats['pruned'])}, live {int(stats['live'])}"
                )
        if (opacity_reset_every and (i + 1) % opacity_reset_every == 0
                and i + 1 < steps and "opacity" in theta):
            # Kerbl sec. 5.2 periodic opacity reset: clamp DOWN to the reset
            # value; dead slots (opacity 0) stay dead, live splats must earn
            # their opacity back before the next prune or they die
            theta = dict(theta, opacity=jnp.minimum(
                theta["opacity"], opacity_reset_value))
            opt_state = opt.init(theta)  # parameter jumped: fresh moments
            if log_every:
                print(f"  opacity reset @{i + 1} -> <= {opacity_reset_value}")
        if checkpoint_path and checkpoint_every and (
            (i + 1) % checkpoint_every == 0 or i + 1 == steps
        ):
            state = {
                "theta": theta, "opt_state": opt_state,
                "splats": dict(splats), "score": score, "key": key,
                "step": jnp.asarray(i + 1, jnp.int32),
                "losses": jnp.stack(losses),
            }
            if ckpt_sh:
                state["sh"] = dict(sh_fixed)
            save_pytree(checkpoint_path, state)
    fitted = dict(splats, **{k: v for k, v in theta.items() if ":" not in k})
    if fit_sh:
        sh_out = {c: theta[f"sh:{c}"] for c in ("r", "g", "b")}
        return fitted, jnp.stack(losses), sh_out
    return fitted, jnp.stack(losses)


def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio of an MSE loss (images in [0, 1])."""
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def fit_camera(
    splats: Splats,
    pose_init: Dict,
    target: jnp.ndarray,
    cfg: RenderConfig,
    steps: int = 100,
    lr: float = 1e-2,
    method: str = "tiles",
    loss: str = "l2",
    fov_deg: float = 45.0,
) -> Tuple[Dict, jnp.ndarray]:
    """Recover the camera POSE that produced `target` (pose registration).

    The whole render is a JAX program, so the image loss differentiates
    through projection back to the orbit parameters themselves
    (camera.orbit_camera_arrays) — the inverse-rendering leg the splat and
    SDF fits don't cover.  pose_init is
    {"azimuth", "elevation", "distance", "target"}; returns the optimized
    pose pytree and the loss curve.

    Good for registering a known splat scene against a photo, or refining a
    noisy pose estimate; like all local registration it needs pose_init in
    the convergence basin (a few degrees / percent off is fine —
    tests/test_fit.py::TestFitCamera).
    """
    import optax

    from .camera import Camera, orbit_camera_arrays
    from .utils.ssim import image_loss

    loss_img = image_loss(loss)
    aspect = cfg.width / cfg.height
    pose = {k: jnp.asarray(v, jnp.float32) for k, v in pose_init.items()}
    opt = optax.adam(lr)
    opt_state = opt.init(pose)

    @jax.jit
    def step(pose, opt_state, splats, target):
        def loss_fn(pose):
            cam = orbit_camera_arrays(pose, fov_deg=fov_deg, aspect=aspect)
            img = render_diff(splats, cam, cfg, method=method)
            return loss_img(img, target)

        val, grads = jax.value_and_grad(loss_fn)(pose)
        updates, opt_state = opt.update(grads, opt_state)
        pose = optax.apply_updates(pose, updates)
        # the Camera class's interaction clamps (camera.py:69-72): crossing
        # the pole makes look_at's basis collapse (NaN poisons Adam), and
        # distance through 0 flips the camera through the target
        pose["elevation"] = jnp.clip(
            pose["elevation"], -Camera.MAX_ELEVATION, Camera.MAX_ELEVATION
        )
        pose["distance"] = jnp.clip(
            pose["distance"], Camera.MIN_DISTANCE, Camera.MAX_DISTANCE
        )
        return val, pose, opt_state

    losses = []
    for _ in range(steps):
        val, pose, opt_state = step(pose, opt_state, splats, target)
        losses.append(val)
    return pose, jnp.stack(losses)


def fit_splats_dp(
    splats: Splats,
    cameras: CameraArrays,  # leaves stacked (V, ...) — orbit_ring format
    targets: jnp.ndarray,  # (V, H, W, 3)
    mesh,  # jax.sharding.Mesh (all devices used, flat view axis)
    cfg: RenderConfig,
    fields: Sequence[str] = FIT_FIELDS_APPEARANCE,
    steps: int = 100,
    lr: float = 3e-2,
    method: str = "tiles",
    loss: str = "l2",
    init: Optional[Dict[str, jnp.ndarray]] = None,
    interpret: bool | None = None,
    sh=None,
    fit_sh: bool = False,
):
    """Multi-view fit with the VIEW axis sharded over the device mesh.

    Each device renders + differentiates its local views (lax.map, so the
    per-view programs stay single-view shaped); the global gradient is one
    `psum` of the local grads over ICI — gradient data parallelism, the
    standard scaling axis of 3DGS-style training.  theta and splats stay
    replicated; the Adam update runs identically everywhere.

    `sh`/`fit_sh` mirror fit_splats: fixed coefficients light every view;
    `fit_sh=True` trains them — the coefficient gradients ride in the same
    replicated theta pytree, so the one grad pmean covers them with no
    extra collective.  Returns (splats, losses[, fitted_sh]).

    The reference has no distributed anything (SURVEY.md section 2.5); this
    composes the rebuild's fit capability with its mesh layer.  Exactness:
    matches single-device fit_splats up to the usual batched-projection fp
    wiggle (tests/test_fit.py::TestFitDP).
    """
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    v = targets.shape[0]
    if v % n_dev:
        raise ValueError(f"view count {v} must divide over {n_dev} devices")
    if not fields and not fit_sh:
        raise ValueError("nothing to fit: fields is empty")
    if fit_sh and sh is None:
        raise ValueError("fit_sh=True needs an initial sh coefficient pytree")
    import optax

    from .utils.ssim import image_loss

    loss_img = image_loss(loss)
    flat_mesh = jax.sharding.Mesh(mesh.devices.reshape(-1), ("v",))
    theta = {k: (init[k] if init and k in init else splats[k]) for k in fields}
    if fit_sh:
        theta.update({f"sh:{c}": sh[c] for c in ("r", "g", "b")})
    sh_fixed = None if fit_sh else sh
    opt = optax.adam(lr)
    opt_state = opt.init(theta)

    def local_value_and_grad(theta, splats, sh_f, cams_local, tgts_local):
        def loss_fn(theta):
            s = dict(splats,
                     **{k: v_ for k, v_ in theta.items() if ":" not in k})
            sh_cur = (
                {c: theta[f"sh:{c}"] for c in ("r", "g", "b")}
                if fit_sh else sh_f
            )

            def one(ct):
                cam, tgt = ct
                s_v = (apply_sh(s, sh_cur, cam["cam_pos"])
                       if sh_cur is not None else s)
                img = render_diff(s_v, cam, cfg, method=method,
                                  interpret=interpret)
                return loss_img(img, tgt)

            return jnp.mean(jax.lax.map(one, (cams_local, tgts_local)))

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        # global mean over equal per-device view counts = mean of local means
        loss = jax.lax.pmean(loss, "v")
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "v"), grads)
        return loss, grads

    vg = jax.shard_map(
        local_value_and_grad,
        mesh=flat_mesh,
        in_specs=(P(), P(), P(), P("v"), P("v")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(theta, opt_state, splats, sh_f, cameras, targets):
        loss, grads = vg(theta, splats, sh_f, cameras, targets)
        updates, opt_state = opt.update(grads, opt_state)
        return loss, optax.apply_updates(theta, updates), opt_state

    losses = []
    for _ in range(steps):
        loss, theta, opt_state = step(
            theta, opt_state, splats, sh_fixed, cameras, targets
        )
        losses.append(loss)
    fitted = dict(splats, **{k: v_ for k, v_ in theta.items() if ":" not in k})
    if fit_sh:
        sh_out = {c: theta[f"sh:{c}"] for c in ("r", "g", "b")}
        return fitted, jnp.stack(losses), sh_out
    return fitted, jnp.stack(losses)


def density_control(
    splats: Splats,
    score: jnp.ndarray,  # (N,) accumulated positional-gradient magnitude
    key: jax.Array,
    densify_threshold: float,
    prune_opacity: float = 0.005,
    split_factor: float = 1.6,
    jitter: float = 0.5,
    sh=None,
    clone_radius: float | None = None,
):
    """One 3DGS adaptive-density event under STATIC shapes.

    The original (Kerbl et al. 2023 sec. 5.2) reallocates a dynamic array;
    on TPU the splat count N is a static capacity and liveness is encoded in
    the fields themselves: a dead slot has radius = 0 (footprint drops it —
    render/binning._footprint_cols) and opacity = 0.

    - prune: live splats with opacity < prune_opacity die (their slots join
      the free pool).
    - densify: live splats whose accumulated positional-gradient score
      exceeds densify_threshold reproduce — the i-th highest-scoring
      candidate copies into the i-th free slot (rank-matching via one sort
      + an N-scale gather/scatter, no dynamic shapes; candidates beyond the
      free pool wait for the next event).  Kerbl sec. 5.2 distinguishes the
      two under-/over-reconstruction regimes and so do we, by world radius
      against `clone_radius` (None = the live-radius mean, the static-shape
      stand-in for percent_dense x scene extent):
        * CLONE (radius <= clone_radius, under-reconstruction): the copy
          keeps the original's size — coverage grows where geometry is
          missing.
        * SPLIT (radius > clone_radius, over-reconstruction): original and
          copy both shrink by split_factor — detail grows where one big
          splat blurs structure.
      Every copy is jittered by `jitter` * its world radius — Kerbl samples
      child positions from the source's own footprint pdf; a sub-radius
      offset (default 0.5 sigma) breaks the gradient symmetry of coincident
      copies so the optimizer can pull the pair apart (a near-zero jitter
      leaves both halves receiving identical gradients and they never
      separate — measured in benchmarks/fit_quality.py --densify).

    `sh` (the ``{"r"|"g"|"b": (n_rest, N)}`` coefficient pytree,
    render/sh.py) reallocates alongside the splats: pruned slots zero their
    coefficient columns, clones copy the source's (view-dependent appearance
    survives the split — the two halves see the same directions).

    Returns (new splats, stats {pruned, split, live}), plus the new sh
    between them when `sh` is given: (new splats, new sh, stats).
    """
    n = score.shape[0]
    radius = splats["radius"]
    opacity = splats["opacity"]
    live = radius > 0.0
    prune = live & (opacity < prune_opacity)
    keep = live & ~prune
    free = ~keep

    cand = keep & (score > densify_threshold)
    # order candidates best-first and free slots index-first (one sort each;
    # rank-matching pairs the i-th best candidate with the i-th free slot)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    _, cand_idx = jax.lax.sort_key_val(jnp.where(cand, -score, jnp.inf), iota)
    _, free_idx = jax.lax.sort_key_val(
        jnp.where(free, iota, n).astype(jnp.int32), iota
    )
    n_cand = jnp.sum(cand.astype(jnp.int32))
    n_free = jnp.sum(free.astype(jnp.int32))
    k_live = jnp.minimum(n_cand, n_free)  # pairs actually split
    pair_ok = iota < k_live
    src = jnp.where(pair_ok, cand_idx, 0)  # candidate for pair i
    dst = jnp.where(pair_ok, free_idx, n)  # its clone's slot (n = dropped)

    out = dict(splats)
    # prune: zero the slot (radius 0 = culled everywhere)
    out["radius"] = jnp.where(prune, 0.0, radius)
    out["opacity"] = jnp.where(prune, 0.0, opacity)
    # clone-vs-split boundary (Kerbl sec. 5.2): small candidates clone at
    # full size, large ones split with both halves shrunk
    if clone_radius is None:
        n_keep = jnp.maximum(jnp.sum(keep.astype(jnp.int32)), 1)
        clone_thr = jnp.sum(jnp.where(keep, radius, 0.0)) / n_keep
    else:
        clone_thr = jnp.asarray(clone_radius, radius.dtype)
    is_big = radius > clone_thr
    # split originals shrink (mask scatter: slots of the paired LARGE
    # candidates; add-then-threshold so unpaired writes to slot 0 cannot
    # clobber).  Small candidates (clones) keep their size.
    split_mask = (
        jnp.zeros((n,), jnp.int32)
        .at[src].add((pair_ok & is_big[src]).astype(jnp.int32), mode="drop")
    ) > 0
    out["radius"] = jnp.where(split_mask, out["radius"] / split_factor,
                              out["radius"])
    # clones: copy every field from src into dst, jittered + shrunk
    keys = jax.random.split(key, 3)
    for f in out:
        vals = out[f][src]  # post-shrink values of the candidates
        if f in ("px", "py", "pz"):
            axis = ("px", "py", "pz").index(f)
            vals = vals + jitter * out["radius"][src] * jax.random.normal(
                keys[axis], vals.shape
            )
        out[f] = out[f].at[dst].set(jnp.where(pair_ok, vals, 0.0), mode="drop")
    n_split = jnp.sum((pair_ok & is_big[src]).astype(jnp.int32))
    stats = {
        "pruned": jnp.sum(prune.astype(jnp.int32)),
        "split": n_split,
        "cloned": k_live - n_split,
        "live": jnp.sum((out["radius"] > 0.0).astype(jnp.int32)),
    }
    if sh is not None:
        sh_out = {}
        for ch, coeff in sh.items():
            c = jnp.where(prune[None, :], 0.0, coeff)
            vals = jnp.where(pair_ok[None, :], c[:, src], 0.0)
            sh_out[ch] = c.at[:, dst].set(vals, mode="drop")
        return out, sh_out, stats
    return out, stats
