"""Tests for the inverse-rendering API (splat_renderer_tpu/fit.py).

Gradient correctness is FD-gated in test_diff.py; here we test the fitting
LOOP: multi-view recovery, init overrides, and the API contract.  The scan
("tiles") method keeps these fast on CPU — the Pallas method's parity is
covered by test_diff.py::TestPallasDiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu import fit
from splat_renderer_tpu.config import RenderConfig
from splat_renderer_tpu.render.pipeline import model_points

CFG = RenderConfig(width=48, height=48, base_radius=0.08,
                   tiles_per_splat_cap=16)


def _setup(key, n=200, views=2):
    scene = spt.SDFScene(
        spt.union(spt.Sphere(id="a", radius=0.5),
                  spt.Box(id="b", position=(0.5, 0, 0), size=(0.3, 0.3, 0.3)))
    )
    cams = []
    for v in range(views):
        cam = spt.Camera(azimuth=0.4 + 2.0 * np.pi * v / max(views, 1),
                         elevation=0.3, aspect=1.0)
        cams.append({k: jnp.asarray(a) for k, a in cam.arrays().items()})
    splats = model_points(scene, scene.params(), key, n, spt.PointConfig(), CFG)
    return cams, splats


class TestFitSplats:
    def test_multiview_color_recovery(self, key):
        cams, splats = _setup(key)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        init = {k: jnp.full_like(splats[k], 0.5) for k in ("cr", "cg", "cb")}
        fitted, losses = fit.fit_splats(
            splats, cams, targets, CFG, fields=("cr", "cg", "cb"),
            steps=30, lr=5e-2, method="tiles", init=init,
        )
        assert losses.shape == (30,)
        assert float(losses[-1]) < float(losses[0]) / 5.0
        # untouched fields pass through unchanged
        np.testing.assert_array_equal(fitted["px"], splats["px"])
        assert not np.allclose(np.asarray(fitted["cr"]), 0.5)

    def test_geometry_fit_descends(self, key):
        cams, splats = _setup(key, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        noise = 0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                         splats["px"].shape)
        _, losses = fit.fit_splats(
            splats, cams, targets, CFG, fields=("px",), steps=20, lr=3e-3,
            method="tiles", init={"px": splats["px"] + noise},
        )
        assert float(losses[-1]) < float(losses[0])

    def test_api_contract(self, key):
        cams, splats = _setup(key, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        with pytest.raises(ValueError):
            fit.fit_splats(splats, cams, targets * 2, CFG)
        with pytest.raises(ValueError):
            fit.fit_splats(splats, cams, targets, CFG, fields=())

    def test_psnr(self):
        assert float(fit.psnr(jnp.asarray(0.01))) == pytest.approx(20.0)


class TestFitSH:
    """View-dependent appearance training (render/sh.py through fit)."""

    def _true_sh(self, n, scale=0.25):
        rng = np.random.default_rng(11)
        return {c: jnp.asarray(rng.normal(scale=scale, size=(3, n))
                               .astype(np.float32))
                for c in ("r", "g", "b")}

    def test_fit_sh_recovers_view_dependence(self, key):
        cams, splats = _setup(key, views=4)
        sh_true = self._true_sh(splats["px"].shape[0])
        targets = fit.render_targets(splats, cams, CFG, method="tiles",
                                     sh=sh_true)
        sh0 = {c: jnp.zeros_like(sh_true[c]) for c in ("r", "g", "b")}
        fitted, losses, sh_fit = fit.fit_splats(
            splats, cams, targets, CFG, fields=(), steps=40, lr=5e-2,
            method="tiles", sh=sh0, fit_sh=True,
        )
        assert float(losses[-1]) < float(losses[0]) / 3.0
        # the fitted coefficients moved off zero toward the truth
        assert float(jnp.abs(sh_fit["r"]).max()) > 1e-2
        np.testing.assert_array_equal(fitted["cr"], splats["cr"])

    def test_fixed_sh_lights_the_fit(self, key):
        cams, splats = _setup(key, views=2)
        sh_true = self._true_sh(splats["px"].shape[0])
        targets = fit.render_targets(splats, cams, CFG, method="tiles",
                                     sh=sh_true)
        init = {k: jnp.full_like(splats[k], 0.5) for k in ("cr", "cg", "cb")}
        _, losses = fit.fit_splats(
            splats, cams, targets, CFG, fields=("cr", "cg", "cb"),
            steps=25, lr=5e-2, method="tiles", init=init, sh=sh_true,
        )
        assert float(losses[-1]) < float(losses[0]) / 3.0

    def test_api_contract(self, key):
        cams, splats = _setup(key, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        with pytest.raises(ValueError, match="initial sh"):
            fit.fit_splats(splats, cams, targets, CFG, fit_sh=True)

    def test_densify_reallocates_fitted_sh(self, key):
        # density control + SH training together: the coefficient columns
        # must follow the population (density_control's sh path)
        cams, splats = _setup(key, n=150, views=1)
        # force churn: 40 slots start nearly transparent -> pruned at the
        # event, their slots refilled by splits of high-gradient survivors
        op = np.asarray(splats["opacity"]).copy()
        op[:40] = 0.001
        splats = dict(splats, opacity=jnp.asarray(op))
        sh_true = self._true_sh(splats["px"].shape[0])
        targets = fit.render_targets(splats, cams, CFG, method="tiles",
                                     sh=sh_true)
        sh0 = {c: jnp.zeros_like(v) for c, v in sh_true.items()}
        fitted, losses, sh_fit = fit.fit_splats(
            splats, cams, targets, CFG,
            fields=fit.DENSIFY_FIELDS + ("cr", "cg", "cb"),
            steps=16, lr=1e-2, method="tiles",
            sh=sh0, fit_sh=True, densify_every=8, densify_threshold=1e-9,
        )
        # density events intentionally perturb the population (prune +
        # jittered splits reset Adam), so strict descent over 16 steps is
        # not guaranteed — the unit mechanics are TestDensityControl's SH
        # tests; here we assert the composition stays sound
        assert bool(jnp.isfinite(losses).all())
        assert float(losses[-1]) < 4.0 * float(losses[0])
        assert sh_fit["r"].shape == sh_true["r"].shape
        # the coefficients moved off zero (SH training kept working through
        # the reallocation)
        assert float(jnp.abs(sh_fit["r"]).max()) > 1e-4
        # PRUNED slots carry zero coefficients (the liveness convention is
        # density_control's: a prune sets radius AND opacity to exactly 0,
        # and zero gradients keep them there).  Slots the OPTIMIZER pushed
        # through radius <= 0 between events are culled-but-not-pruned and
        # legitimately keep their fitted coefficients, so detect prunes by
        # the exact double-zero signature.  Churn really happened: the 40
        # transparent slots died or were refilled.
        pruned = (np.asarray(fitted["radius"]) == 0.0) & (
            np.asarray(fitted["opacity"]) == 0.0
        )
        assert not np.allclose(np.asarray(fitted["radius"]),
                               np.asarray(splats["radius"]))
        if pruned.any():
            np.testing.assert_allclose(
                np.asarray(sh_fit["g"])[:, pruned], 0.0, atol=1e-6
            )


class TestFitCamera:
    """Pose registration: recover the orbit pose that produced the target."""

    def test_recovers_perturbed_pose(self, key):
        from splat_renderer_tpu.camera import orbit_camera_arrays

        _, splats = _setup(key, n=256)
        true_pose = {"azimuth": 0.5, "elevation": 0.3, "distance": 3.0,
                     "target": np.zeros(3, np.float32)}
        cam = orbit_camera_arrays(true_pose, aspect=1.0)
        target = spt.render.render_diff(splats, cam, CFG, method="tiles")
        init = dict(true_pose, azimuth=0.56, elevation=0.25, distance=3.15)
        pose, losses = fit.fit_camera(splats, init, target, CFG,
                                      steps=100, lr=5e-3, method="tiles")
        assert float(losses[-1]) < float(losses[0]) / 5.0
        assert abs(float(pose["azimuth"]) - 0.5) < 0.02
        assert abs(float(pose["elevation"]) - 0.3) < 0.02
        # distance is the weakly-constrained axis at 48x48 (depth/scale
        # near-ambiguity for soft splats): it halves its 0.15 error and
        # stalls where the images become indistinguishable — so the strong
        # check is the registered IMAGE, not the parameter
        assert abs(float(pose["distance"]) - 3.0) < 0.1
        reg = spt.render.render_diff(
            splats, orbit_camera_arrays(pose, aspect=1.0), CFG,
            method="tiles",
        )
        assert float(jnp.abs(reg - target).max()) < 0.02


class TestFitCheckpoint:
    """Checkpoint/resume of the full training state (utils/snapshot)."""

    def test_resume_is_bitwise_identical(self, key, tmp_path):
        cams, splats = _setup(key, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        kwargs = dict(fields=("cr", "cg"), lr=5e-2, method="tiles")
        ref, ref_losses = fit.fit_splats(
            splats, cams, targets, CFG, steps=8, **kwargs
        )
        ck = str(tmp_path / "fit.npz")
        fit.fit_splats(
            splats, cams, targets, CFG, steps=4,
            checkpoint_path=ck, checkpoint_every=2, **kwargs
        )
        res, res_losses = fit.fit_splats(
            splats, cams, targets, CFG, steps=8,
            checkpoint_path=ck, checkpoint_every=2, resume=True, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(ref_losses),
                                      np.asarray(res_losses))
        for f in ("cr", "cg"):
            np.testing.assert_array_equal(np.asarray(ref[f]),
                                          np.asarray(res[f]))

    def test_resume_with_densify_state(self, key, tmp_path):
        cams, splats = _setup(key, n=128, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        fields = ("px", "py", "pz", "radius", "opacity")
        ck = str(tmp_path / "fit_d.npz")
        fit.fit_splats(
            splats, cams, targets, CFG, fields=fields, steps=3, lr=1e-3,
            method="tiles", densify_every=2, checkpoint_path=ck,
            checkpoint_every=3,
        )
        fitted, losses = fit.fit_splats(
            splats, cams, targets, CFG, fields=fields, steps=6, lr=1e-3,
            method="tiles", densify_every=2, checkpoint_path=ck,
            checkpoint_every=3, resume=True,
        )
        assert losses.shape == (6,)
        assert np.all(np.isfinite(np.asarray(losses)))
        assert fitted["px"].shape == splats["px"].shape

    def test_suffixless_path_and_incompatibility_guards(self, key, tmp_path):
        cams, splats = _setup(key)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        kwargs = dict(fields=("cr",), lr=5e-2, method="tiles")
        ck = str(tmp_path / "state")  # no .npz: np.savez appends it
        fit.fit_splats(splats, cams, targets, CFG, steps=4,
                       checkpoint_path=ck, checkpoint_every=2, **kwargs)
        # resume must find the file savez actually wrote
        _, losses = fit.fit_splats(splats, cams, targets, CFG, steps=6,
                                   checkpoint_path=ck, checkpoint_every=2,
                                   resume=True, **kwargs)
        assert losses.shape == (6,)
        # a checkpoint from a different splat population must not hijack
        smaller = {k: v[:100] for k, v in splats.items()}
        tg2 = fit.render_targets(smaller, cams, CFG, method="tiles")
        with pytest.raises(ValueError, match="incompatible"):
            fit.fit_splats(smaller, cams, tg2, CFG, steps=6,
                           checkpoint_path=ck, checkpoint_every=2,
                           resume=True, **kwargs)
        # different fields -> different leaves -> clear error
        with pytest.raises(ValueError, match="incompatible"):
            fit.fit_splats(splats, cams, targets, CFG, steps=6,
                           checkpoint_path=ck, checkpoint_every=2,
                           resume=True, fields=("cb",), lr=5e-2,
                           method="tiles")
        # asking for fewer steps than already done is a user error
        with pytest.raises(ValueError, match="already holds"):
            fit.fit_splats(splats, cams, targets, CFG, steps=3,
                           checkpoint_path=ck, checkpoint_every=2,
                           resume=True, **kwargs)

    def test_pytree_roundtrip(self, tmp_path):
        from splat_renderer_tpu.utils.snapshot import load_pytree, save_pytree

        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)),
                                            "d": jnp.asarray(3)}}
        p = str(tmp_path / "t.npz")
        save_pytree(p, tree)
        like = jax.tree.map(jnp.zeros_like, tree)
        out = load_pytree(p, like)
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            tree, out,
        )


class TestFitDP:
    def test_matches_single_device(self, key):
        """View-DP fit over the 8-device CPU mesh descends like the
        single-device loop on the same 8 views."""
        from splat_renderer_tpu.parallel.sharding import make_mesh

        cams_l, splats = _setup(key, n=150, views=8)
        cfg = RenderConfig(width=32, height=32, base_radius=0.1,
                           tiles_per_splat_cap=16)
        targets_l = fit.render_targets(splats, cams_l, cfg, method="tiles")
        cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cams_l)
        targets = jnp.stack(targets_l)
        init = {k: jnp.full_like(splats[k], 0.5) for k in ("cr", "cg", "cb")}

        mesh = make_mesh(dp=8, sp=1)
        fitted_dp, losses_dp = fit.fit_splats_dp(
            splats, cams, targets, mesh, cfg, fields=("cr", "cg", "cb"),
            steps=10, lr=5e-2, method="tiles", init=init,
        )
        _, losses_1 = fit.fit_splats(
            splats, cams_l, targets_l, cfg, fields=("cr", "cg", "cb"),
            steps=10, lr=5e-2, method="tiles", init=init,
        )
        assert float(losses_dp[-1]) < float(losses_dp[0]) / 2.0
        # same optimization trajectory up to batched-projection fp wiggle
        np.testing.assert_allclose(np.asarray(losses_dp),
                                   np.asarray(losses_1), rtol=2e-2)

    def test_fit_sh_over_the_mesh(self, key):
        """SH coefficient training rides the same replicated-theta pmean."""
        from splat_renderer_tpu.parallel.sharding import make_mesh

        cams_l, splats = _setup(key, n=150, views=8)
        cfg = RenderConfig(width=32, height=32, base_radius=0.1,
                           tiles_per_splat_cap=16)
        n = splats["px"].shape[0]
        rng = np.random.default_rng(13)
        sh_true = {c: jnp.asarray(rng.normal(scale=0.25, size=(3, n))
                                  .astype(np.float32))
                   for c in ("r", "g", "b")}
        targets_l = fit.render_targets(splats, cams_l, cfg, method="tiles",
                                       sh=sh_true)
        cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cams_l)
        sh0 = {c: jnp.zeros_like(v) for c, v in sh_true.items()}
        fitted, losses, sh_fit = fit.fit_splats_dp(
            splats, cams, jnp.stack(targets_l), make_mesh(dp=8, sp=1), cfg,
            fields=(), steps=12, lr=5e-2, method="tiles",
            sh=sh0, fit_sh=True,
        )
        assert float(losses[-1]) < float(losses[0]) / 2.0
        assert float(jnp.abs(sh_fit["r"]).max()) > 1e-2
        np.testing.assert_array_equal(fitted["cr"], splats["cr"])

    def test_view_count_must_divide(self, key):
        from splat_renderer_tpu.parallel.sharding import make_mesh

        cams_l, splats = _setup(key, n=64, views=3)
        cfg = RenderConfig(width=32, height=32, base_radius=0.1)
        targets_l = fit.render_targets(splats, cams_l, cfg, method="tiles")
        cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cams_l)
        with pytest.raises(ValueError):
            fit.fit_splats_dp(splats, cams, jnp.stack(targets_l),
                              make_mesh(dp=8, sp=1), cfg)


class TestDensityControl:
    def _toy(self, n=8):
        base = {
            "px": jnp.arange(n, dtype=jnp.float32),
            "py": jnp.zeros((n,)), "pz": jnp.zeros((n,)),
            "radius": jnp.full((n,), 0.1),
            "opacity": jnp.full((n,), 0.8),
            "cr": jnp.linspace(0, 1, n), "cg": jnp.zeros((n,)),
            "cb": jnp.ones((n,)),
            "nx": jnp.zeros((n,)), "ny": jnp.zeros((n,)),
            "nz": jnp.ones((n,)),
        }
        return base

    def test_prune_and_split(self):
        s = self._toy()
        # slot 2 nearly transparent -> pruned; slot 5 high score AND larger
        # than the live-radius mean -> SPLITS (over-reconstruction regime)
        s["opacity"] = s["opacity"].at[2].set(0.001)
        s["radius"] = s["radius"].at[5].set(0.3)
        score = jnp.zeros((8,)).at[5].set(1.0)
        out, stats = fit.density_control(
            s, score, jax.random.PRNGKey(0), densify_threshold=0.5
        )
        assert int(stats["pruned"]) == 1 and int(stats["split"]) == 1
        assert int(stats["cloned"]) == 0
        # the pruned slot is immediately reused by the split's copy
        assert float(out["opacity"][2]) == pytest.approx(0.8)
        assert float(out["radius"][5]) == pytest.approx(0.3 / 1.6)
        assert float(out["radius"][2]) == pytest.approx(0.3 / 1.6)
        assert float(out["cr"][2]) == pytest.approx(float(s["cr"][5]))
        # copy is near (jittered within ~the source footprint), not identical
        assert 0 < abs(float(out["px"][2]) - 5.0) < 1.0
        assert int(stats["live"]) == 8  # one died, one was born

    def test_clone_keeps_size(self):
        """Kerbl sec. 5.2 under-reconstruction: a candidate SMALLER than the
        clone boundary copies at FULL size (both original and copy)."""
        s = self._toy()
        s["opacity"] = s["opacity"].at[2].set(0.001)  # free slot
        s["radius"] = s["radius"].at[6].set(0.5)  # pull the mean above 0.1
        score = jnp.zeros((8,)).at[5].set(1.0)  # slot 5: radius 0.1 < mean
        out, stats = fit.density_control(
            s, score, jax.random.PRNGKey(0), densify_threshold=0.5
        )
        assert int(stats["cloned"]) == 1 and int(stats["split"]) == 0
        assert float(out["radius"][5]) == pytest.approx(0.1)  # unshrunk
        assert float(out["radius"][2]) == pytest.approx(0.1)  # clone full size
        assert float(out["cr"][2]) == pytest.approx(float(s["cr"][5]))

    def test_clone_radius_boundary_explicit(self):
        """An explicit clone_radius overrides the live-mean default."""
        s = self._toy()
        s["opacity"] = s["opacity"].at[2].set(0.001)
        score = jnp.zeros((8,)).at[5].set(1.0)
        # boundary below every radius -> the candidate is "big" -> split
        out, stats = fit.density_control(
            s, score, jax.random.PRNGKey(0), densify_threshold=0.5,
            clone_radius=0.05,
        )
        assert int(stats["split"]) == 1 and int(stats["cloned"]) == 0
        assert float(out["radius"][5]) == pytest.approx(0.1 / 1.6)
        # boundary above every radius -> clone
        out2, stats2 = fit.density_control(
            s, score, jax.random.PRNGKey(0), densify_threshold=0.5,
            clone_radius=0.5,
        )
        assert int(stats2["cloned"]) == 1 and int(stats2["split"]) == 0
        assert float(out2["radius"][5]) == pytest.approx(0.1)

    def test_opacity_reset_event(self, key):
        """fit_splats(opacity_reset_every=...): opacities clamp down to the
        reset value at the event and recover by the optimizer afterwards."""
        cams, splats = _setup(key, n=100, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        fitted, losses = fit.fit_splats(
            splats, cams, targets, CFG,
            fields=("opacity", "cr", "cg", "cb"), steps=8, lr=5e-2,
            method="tiles", opacity_reset_every=4,
        )
        assert np.isfinite(np.asarray(losses)).all()
        # the reset perturbs the loss at step 4; the fit must still descend
        # overall and opacities must move back up from the reset value
        assert float(np.asarray(fitted["opacity"]).max()) > 0.011

    def test_sh_rows_follow_prune_and_split(self):
        s = self._toy()
        s["opacity"] = s["opacity"].at[2].set(0.001)  # pruned
        score = jnp.zeros((8,)).at[5].set(1.0)  # splits into slot 2
        sh = {c: jnp.broadcast_to(jnp.arange(8, dtype=jnp.float32), (3, 8))
              for c in ("r", "g", "b")}
        out, sh_out, stats = fit.density_control(
            s, score, jax.random.PRNGKey(0), densify_threshold=0.5, sh=sh
        )
        # uniform radii sit AT the live mean -> the candidate clones; the
        # coefficient reallocation is identical for clone and split
        assert int(stats["split"]) + int(stats["cloned"]) == 1
        # clone slot 2 carries the source's coefficients, others unchanged
        want = np.arange(8, dtype=np.float32)
        want[2] = 5.0
        for c in ("r", "g", "b"):
            np.testing.assert_allclose(np.asarray(sh_out[c]),
                                       np.broadcast_to(want, (3, 8)))

    def test_sh_rows_zeroed_on_unreused_prune(self):
        s = self._toy()
        s["opacity"] = s["opacity"].at[2].set(0.001)
        sh = {c: jnp.ones((3, 8)) for c in ("r", "g", "b")}
        out, sh_out, stats = fit.density_control(
            s, jnp.zeros((8,)), jax.random.PRNGKey(0), densify_threshold=0.5,
            sh=sh,
        )
        assert int(stats["pruned"]) == 1 and int(stats["split"]) == 0
        np.testing.assert_allclose(np.asarray(sh_out["r"][:, 2]), 0.0)
        np.testing.assert_allclose(np.asarray(sh_out["g"][:, 3]), 1.0)

    def test_no_candidates_no_change(self):
        s = self._toy()
        out, stats = fit.density_control(
            s, jnp.zeros((8,)), jax.random.PRNGKey(0), densify_threshold=0.5
        )
        assert int(stats["split"]) == 0 and int(stats["pruned"]) == 0
        for k in s:
            np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(s[k]))

    def test_split_bounded_by_free_slots(self):
        s = self._toy()
        score = jnp.ones((8,))  # everyone wants to split, nobody is free
        out, stats = fit.density_control(
            s, score, jax.random.PRNGKey(0), densify_threshold=0.5
        )
        assert int(stats["split"]) == 0
        np.testing.assert_array_equal(np.asarray(out["radius"]),
                                      np.asarray(s["radius"]))

    def test_densified_fit_runs(self, key):
        cams, splats = _setup(key, n=150, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        noise = 0.05 * jax.random.normal(jax.random.PRNGKey(3),
                                         splats["px"].shape)
        fields = ("px", "py", "pz", "radius", "opacity", "cr", "cg", "cb")
        fitted, losses = fit.fit_splats(
            splats, cams, targets, CFG, fields=fields, steps=12, lr=3e-3,
            method="tiles", init={"px": splats["px"] + noise},
            densify_every=5, densify_threshold=1e-7,
        )
        assert np.isfinite(np.asarray(losses)).all()
        assert float(losses[-1]) < float(losses[0])

    def test_densify_requires_geometry_fields(self, key):
        cams, splats = _setup(key, n=64, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        with pytest.raises(ValueError):
            fit.fit_splats(splats, cams, targets, CFG, fields=("cr",),
                           densify_every=5)


class TestSSIM:
    """utils/ssim.py: the 3DGS training objective (L1 + D-SSIM)."""

    def test_identity_is_one(self, key):
        from splat_renderer_tpu.utils.ssim import dssim_l1, ssim

        img = jax.random.uniform(key, (32, 32, 3))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-6)
        assert float(dssim_l1(img, img)) == pytest.approx(0.0, abs=1e-6)

    def test_matches_dense_numpy_reference(self, key):
        """Separable SAME-padded blur == one dense 11x11 zero-padded conv."""
        from splat_renderer_tpu.utils.ssim import _SIGMA, _WINDOW, ssim

        k1, k2 = jax.random.split(key)
        a = np.asarray(jax.random.uniform(k1, (24, 24)))
        b = np.clip(a + 0.1 * np.asarray(jax.random.normal(k2, (24, 24))), 0, 1)

        x = np.arange(_WINDOW) - (_WINDOW - 1) / 2.0
        g = np.exp(-(x**2) / (2.0 * _SIGMA**2))
        g /= g.sum()
        w = np.outer(g, g)
        pad = _WINDOW // 2

        def blur(img):
            p = np.pad(img, pad)
            out = np.zeros_like(img)
            for i in range(img.shape[0]):
                for j in range(img.shape[1]):
                    out[i, j] = (p[i:i + _WINDOW, j:j + _WINDOW] * w).sum()
            return out

        c1, c2 = 0.01**2, 0.03**2
        mx, my = blur(a), blur(b)
        vx, vy = blur(a * a) - mx * mx, blur(b * b) - my * my
        cov = blur(a * b) - mx * my
        ref = np.mean(
            ((2 * mx * my + c1) * (2 * cov + c2))
            / ((mx * mx + my * my + c1) * (vx + vy + c2))
        )
        assert float(ssim(a, b)) == pytest.approx(ref, abs=2e-5)

    def test_monotone_in_noise(self, key):
        from splat_renderer_tpu.utils.ssim import ssim

        img = jax.random.uniform(key, (32, 32, 3))
        noise = jax.random.normal(jax.random.PRNGKey(3), img.shape)
        s1 = float(ssim(img, jnp.clip(img + 0.05 * noise, 0, 1)))
        s2 = float(ssim(img, jnp.clip(img + 0.30 * noise, 0, 1)))
        assert 1.0 > s1 > s2

    def test_differentiable(self, key):
        from splat_renderer_tpu.utils.ssim import dssim_l1

        k1, k2 = jax.random.split(key)
        img = jax.random.uniform(k1, (16, 16, 3))
        tgt = jax.random.uniform(k2, (16, 16, 3))
        g = jax.grad(lambda im: dssim_l1(im, tgt))(img)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0

    def test_registry(self):
        from splat_renderer_tpu.utils.ssim import image_loss

        a = jnp.zeros((8, 8, 3))
        b = jnp.ones((8, 8, 3)) * 0.5
        assert float(image_loss("l2")(a, b)) == pytest.approx(0.25)
        assert float(image_loss("l1")(a, b)) == pytest.approx(0.5)
        with pytest.raises(ValueError):
            image_loss("huber")

    def test_fit_with_ssim_loss_descends(self, key):
        cams, splats = _setup(key, views=1)
        targets = fit.render_targets(splats, cams, CFG, method="tiles")
        init = {k: jnp.full_like(splats[k], 0.5) for k in ("cr", "cg", "cb")}
        _, losses = fit.fit_splats(
            splats, cams, targets, CFG, fields=("cr", "cg", "cb"),
            steps=15, lr=5e-2, method="tiles", loss="ssim", init=init,
        )
        assert float(losses[-1]) < float(losses[0]) / 2.0
