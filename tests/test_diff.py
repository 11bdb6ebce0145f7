"""Differentiable-rendering tests (render/diff.py).

The WebGPU reference is forward-only (WGSL has no autodiff); gradient flow
through the pipeline is a rebuild-only capability, so there is no reference
counterpart to cite — the ground truth here is finite differences and
loss-descent behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import RenderConfig
from splat_renderer_tpu.render import render_diff, render_splats
from splat_renderer_tpu.render.pipeline import model_points

CFG = RenderConfig(width=64, height=64, base_radius=0.08,
                   tiles_per_splat_cap=16)


def _scene_and_splats(key, n=300, cfg=CFG):
    scene = spt.SDFScene(
        spt.union(spt.Sphere(id="a", radius=0.5),
                  spt.Box(id="b", position=(0.5, 0, 0), size=(0.3, 0.3, 0.3)))
    )
    cam = spt.Camera(azimuth=0.4, elevation=0.3, aspect=1.0)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = model_points(scene, scene.params(), key, n, spt.PointConfig(), cfg)
    return scene, camera, splats


class TestForward:
    def test_matches_exact_pipeline_within_quantization(self, key):
        """The diff render differs from the exact (quantized) pipeline only
        by the grid snap: <= 1/pos_scale px positions, 1/255 colors."""
        _, camera, splats = _scene_and_splats(key)
        img_d = np.asarray(render_diff(splats, camera, CFG))
        img_q = np.asarray(render_splats(splats, camera, CFG, "oracle"))
        assert np.all(np.isfinite(img_d))
        # quantization moves a splat edge across at most ~a pixel's worth of
        # alpha at isolated pixels; images agree closely in the mean
        assert np.abs(img_d - img_q).mean() < 2e-3

    def test_tiles_method_matches_oracle_method(self, key):
        _, camera, splats = _scene_and_splats(key)
        img_o = np.asarray(render_diff(splats, camera, CFG, method="oracle"))
        img_t = np.asarray(render_diff(splats, camera, CFG, method="tiles"))
        np.testing.assert_allclose(img_t, img_o, atol=3e-5)

    def test_unknown_method_raises(self, key):
        _, camera, splats = _scene_and_splats(key)
        with pytest.raises(ValueError):
            render_diff(splats, camera, CFG, method="nope")


class TestGradients:
    @pytest.mark.parametrize("method", ["oracle", "tiles"])
    def test_color_gradient_matches_finite_differences(self, key, method):
        _, camera, splats = _scene_and_splats(key, n=120)
        target = jnp.zeros((CFG.height, CFG.width, 3)) + 0.5

        @jax.jit  # one compile, 9 evals (grad + 8 FD probes)
        def loss(cr):
            s = dict(splats, cr=cr)
            img = render_diff(s, camera, CFG, method=method)
            return jnp.mean((img - target) ** 2)

        g = jax.jit(jax.grad(loss))(splats["cr"])
        assert np.all(np.isfinite(np.asarray(g)))
        # check a handful of indices against central differences
        idx = np.argsort(-np.abs(np.asarray(g)))[:4]
        eps = 1e-2
        for i in idx:
            e = jnp.zeros_like(splats["cr"]).at[i].set(eps)
            fd = (loss(splats["cr"] + e) - loss(splats["cr"] - e)) / (2 * eps)
            assert float(fd) == pytest.approx(float(g[i]), rel=0.05, abs=1e-7)

    def test_position_gradient_matches_finite_differences(self, key):
        """Positions move splat centers across pixels — the gradient is exact
        between support-cutoff crossings; FD with a small step stays inside
        the smooth region for most splats."""
        _, camera, splats = _scene_and_splats(key, n=80)
        target = jnp.zeros((CFG.height, CFG.width, 3)) + 0.3

        @jax.jit
        def loss(px):
            s = dict(splats, px=px)
            img = render_diff(s, camera, CFG)
            return jnp.mean((img - target) ** 2)

        g = jax.jit(jax.grad(loss))(splats["px"])
        assert np.all(np.isfinite(np.asarray(g)))
        idx = np.argsort(-np.abs(np.asarray(g)))[:3]
        eps = 1e-4
        ok = 0
        for i in idx:
            e = jnp.zeros_like(splats["px"]).at[i].set(eps)
            fd = (loss(splats["px"] + e) - loss(splats["px"] - e)) / (2 * eps)
            if float(fd) == pytest.approx(float(g[i]), rel=0.15, abs=1e-9):
                ok += 1
        # cutoff crossings can spoil individual FD probes; most must agree
        assert ok >= 2

    def test_opacity_and_radius_receive_gradient(self, key):
        _, camera, splats = _scene_and_splats(key, n=200)

        def loss(op, rad):
            s = dict(splats, opacity=op, radius=rad)
            img = render_diff(s, camera, CFG)
            return jnp.mean(img**2)

        go, gr = jax.grad(loss, argnums=(0, 1))(
            splats["opacity"], splats["radius"]
        )
        assert np.all(np.isfinite(np.asarray(go)))
        assert np.all(np.isfinite(np.asarray(gr)))
        assert float(jnp.abs(go).max()) > 0
        assert float(jnp.abs(gr).max()) > 0


class TestPallasDiff:
    """The custom-VJP Pallas blend (ops/tile_blend_diff.py), interpret mode.

    Ground truth is the scan-compositor diff path whose gradients are
    themselves FD-verified above — both paths share semantics (continuous
    planes, alpha <= 1 - 1e-7 clamp, stop-gradient structure)."""

    def test_forward_matches_tiles(self, key):
        _, camera, splats = _scene_and_splats(key, n=250)
        img_t = np.asarray(render_diff(splats, camera, CFG, method="tiles"))
        img_p = np.asarray(
            render_diff(splats, camera, CFG, method="pallas", interpret=True)
        )
        np.testing.assert_allclose(img_p, img_t, atol=3e-6)

    def test_gradients_match_tiles(self, key):
        _, camera, splats = _scene_and_splats(key, n=200)
        target = jnp.full((CFG.height, CFG.width, 3), 0.4)
        fields = ("px", "py", "pz", "radius", "opacity", "cr", "cg", "cb")

        def make_loss(method):
            def f(theta):
                img = render_diff(dict(splats, **theta), camera, CFG,
                                  method=method, interpret=True)
                return jnp.mean((img - target) ** 2)
            return f

        theta = {k: splats[k] for k in fields}
        gt = jax.grad(make_loss("tiles"))(theta)
        gp = jax.grad(make_loss("pallas"))(theta)
        for k in fields:
            a, b = np.asarray(gt[k]), np.asarray(gp[k])
            scale = np.abs(a).max() + 1e-12
            assert np.isfinite(b).all(), k
            assert np.abs(a - b).max() / scale < 1e-4, (
                f"{k}: maxrel {np.abs(a - b).max() / scale:.2e}"
            )

    def test_oriented_gradients_match_tiles(self, key):
        """The ellipse branch: forward + grads through angle/ratio (via the
        normals) against the scan path."""
        import dataclasses

        cfg_o = dataclasses.replace(CFG, oriented=True)
        _, camera, splats = _scene_and_splats(key, n=150, cfg=cfg_o)
        img_t = np.asarray(render_diff(splats, camera, cfg_o, method="tiles"))
        img_p = np.asarray(
            render_diff(splats, camera, cfg_o, method="pallas", interpret=True)
        )
        np.testing.assert_allclose(img_p, img_t, atol=3e-6)

        target = jnp.full((cfg_o.height, cfg_o.width, 3), 0.4)
        fields = ("px", "nx", "ny", "radius", "opacity", "cr")

        def make_loss(method):
            def f(theta):
                img = render_diff(dict(splats, **theta), camera, cfg_o,
                                  method=method, interpret=True)
                return jnp.mean((img - target) ** 2)
            return f

        theta = {k: splats[k] for k in fields}
        gt = jax.grad(make_loss("tiles"))(theta)
        gp = jax.grad(make_loss("pallas"))(theta)
        for k in fields:
            a, b = np.asarray(gt[k]), np.asarray(gp[k])
            scale = np.abs(a).max() + 1e-12
            assert np.isfinite(b).all(), k
            assert np.abs(a - b).max() / scale < 1e-3, (
                f"{k}: maxrel {np.abs(a - b).max() / scale:.2e}"
            )

    def test_opaque_raises(self, key):
        import dataclasses

        _, camera, splats = _scene_and_splats(key, n=64)
        cfg_z = dataclasses.replace(CFG, oriented=True, opaque=True)
        with pytest.raises(ValueError):
            render_diff(splats, camera, cfg_z, method="pallas", interpret=True)

    def test_fit_descends(self, key):
        _, camera, splats = _scene_and_splats(key, n=200)
        target = render_diff(splats, camera, CFG, method="pallas",
                             interpret=True)
        theta = {k: jnp.full_like(splats[k], 0.5) for k in ("cr", "cg", "cb")}

        @jax.jit
        def step(c, target):
            def loss(c):
                img = render_diff(dict(splats, **c), camera, CFG,
                                  method="pallas", interpret=True)
                return jnp.mean((img - target) ** 2)

            l, g = jax.value_and_grad(loss)(c)
            return l, jax.tree.map(lambda x, gx: x - 200.0 * gx, c, g)

        l0, theta = step(theta, target)
        for _ in range(15):
            l, theta = step(theta, target)
        assert float(l) < float(l0) / 4.0


class TestFitting:
    def test_color_fit_recovers_target(self, key):
        """Inverse rendering smoke test: gray-initialized colors descend to a
        color-render target; loss must drop by >10x in 40 GD steps."""
        _, camera, splats = _scene_and_splats(key, n=250)
        target = render_diff(splats, camera, CFG)

        init = {
            "cr": jnp.full_like(splats["cr"], 0.5),
            "cg": jnp.full_like(splats["cg"], 0.5),
            "cb": jnp.full_like(splats["cb"], 0.5),
        }

        # target passed as a jit ARGUMENT, not captured: over the axon TPU
        # relay, image-sized array constants baked into a large program can
        # yield a wrong scalar loss (see fit_demo.py / CLAUDE.md).
        @jax.jit
        def step(c, target):
            def loss(c):
                img = render_diff(dict(splats, **c), camera, CFG)
                return jnp.mean((img - target) ** 2)

            l, g = jax.value_and_grad(loss)(c)
            return l, jax.tree.map(lambda x, gx: x - 200.0 * gx, c, g)

        c = init
        l0, c = step(c, target)
        for _ in range(40):
            l, c = step(c, target)
        assert float(l) < float(l0) / 10.0

    def test_end_to_end_sdf_parameter_gradient(self, key):
        """Gradient flows through the WHOLE pipeline — seeding, Newton
        projection, curvature, splat derivation, projection, blend — to an
        SDF scene parameter (the sphere radius)."""
        cfg = RenderConfig(width=48, height=48, base_radius=0.1,
                           tiles_per_splat_cap=16)
        scene = spt.SDFScene(spt.Sphere(id="s", radius=0.5))
        cam = spt.Camera(aspect=1.0)
        camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        params = scene.params()

        @jax.jit
        def silhouette(params):
            splats = model_points(
                scene, params, key, 400, spt.PointConfig(), cfg
            )
            img = render_diff(splats, camera, cfg)
            bg = jnp.asarray(cfg.background)
            return jnp.mean(jnp.abs(img - bg))  # grows with apparent size

        g = jax.jit(jax.grad(silhouette))(params)
        g_rad = float(g["s"]["radius"])
        assert np.isfinite(g_rad)
        # a bigger sphere covers more pixels -> positive silhouette gradient
        assert g_rad > 0
        # finite-difference corroboration (coarse: reseeding noise is frozen
        # by the fixed key, so FD is smooth in radius)
        eps = 1e-3
        p_hi = {"s": dict(params["s"], radius=params["s"]["radius"] + eps)}
        p_lo = {"s": dict(params["s"], radius=params["s"]["radius"] - eps)}
        fd = (silhouette(p_hi) - silhouette(p_lo)) / (2 * eps)
        assert float(fd) == pytest.approx(g_rad, rel=0.2)


class TestDepthGradients:
    """Differentiable G-buffer (render_diff_gbuffer) + depth supervision."""

    def test_forward_matches_exact_gbuffer(self, key):
        from splat_renderer_tpu.render import render_diff_gbuffer, render_gbuffer
        from splat_renderer_tpu.render.pipeline import splat_screen_data

        _, camera, splats = _scene_and_splats(key)
        gb_d = render_diff_gbuffer(splats, camera, CFG)
        gb_q = render_gbuffer(splats, camera, CFG)
        # same semantics up to the grid snap (cf. TestForward tolerance)
        assert np.abs(np.asarray(gb_d["rgb"]) - np.asarray(gb_q["rgb"])
                      ).mean() < 2e-3
        assert np.abs(np.asarray(gb_d["alpha"]) - np.asarray(gb_q["alpha"])
                      ).mean() < 2e-3
        hit = np.asarray(gb_q["alpha"]) > 0.5
        assert np.abs(np.asarray(gb_d["depth"]) - np.asarray(gb_q["depth"])
                      )[hit].mean() < 5e-3

    def test_depth_gradient_matches_finite_differences(self, key):
        """The along-ray direction: a masked depth-L1 loss must push pz with
        the FD-verified gradient (color losses barely constrain it)."""
        from splat_renderer_tpu.render import render_diff_gbuffer

        _, camera, splats = _scene_and_splats(key, n=80)
        gb0 = render_diff_gbuffer(splats, camera, CFG)
        # target: the scene itself shifted 0.05 farther — a pure-depth signal
        dt = jnp.where(gb0["alpha"] > 0.5, gb0["depth"] + 0.05, 0.0)
        mask = (dt > 0.0).astype(jnp.float32)

        @jax.jit
        def loss(pz):
            gb = render_diff_gbuffer(dict(splats, pz=pz), camera, CFG)
            return jnp.sum(jnp.abs(gb["depth"] - dt) * mask) / jnp.sum(mask)

        g = jax.jit(jax.grad(loss))(splats["pz"])
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0
        idx = np.argsort(-np.abs(np.asarray(g)))[:3]
        eps = 1e-3
        ok = 0
        for i in idx:
            e = jnp.zeros_like(splats["pz"]).at[i].set(eps)
            fd = (loss(splats["pz"] + e) - loss(splats["pz"] - e)) / (2 * eps)
            if float(fd) == pytest.approx(float(g[i]), rel=0.2, abs=1e-9):
                ok += 1
        assert ok >= 2

    def test_depth_supervision_recovers_along_ray_shift(self, key):
        """fit_splats(depth_targets=...): a whole-cloud shift ALONG the view
        ray is nearly invisible to color (the scene just gets slightly
        smaller) but fully visible to depth — the depth term must pull the
        positions back."""
        from splat_renderer_tpu.fit import fit_splats
        from splat_renderer_tpu.render import render_diff, render_diff_gbuffer

        _, camera, splats = _scene_and_splats(key, n=250)
        gb = render_diff_gbuffer(splats, camera, CFG)
        target = render_diff(splats, camera, CFG, method="tiles")
        cam_pos = np.asarray(camera["cam_pos"])
        # shift every splat 0.08 away from the camera along its own ray
        p = np.stack([np.asarray(splats[k]) for k in ("px", "py", "pz")], 1)
        ray = p - cam_pos
        ray /= np.maximum(np.linalg.norm(ray, axis=1, keepdims=True), 1e-9)
        shifted = {k: jnp.asarray(p[:, i] + 0.08 * ray[:, i])
                   for i, k in enumerate(("px", "py", "pz"))}

        mask = np.asarray(gb["alpha"] > 0.5)

        def depth_err(s):
            d = np.asarray(render_diff_gbuffer(s, camera, CFG)["depth"])
            return float(np.abs(d - np.asarray(gb["depth"]))[mask].mean())

        start = dict(splats, **shifted)
        init_err = depth_err(start)
        assert init_err > 0.05  # the shift is visible in depth
        fitted, _ = fit_splats(
            start, [camera], [target], CFG,
            fields=("px", "py", "pz"), steps=40, lr=8e-3, method="tiles",
            depth_targets=[gb["depth"]], depth_weight=1.0,
        )
        # control: the same fit on color alone barely sees the along-ray
        # error (per-splat positions are not even identifiable from depth —
        # the promise is the rendered DEPTH MAP, so that is what we gate)
        fitted_rgb, _ = fit_splats(
            start, [camera], [target], CFG,
            fields=("px", "py", "pz"), steps=40, lr=8e-3, method="tiles",
        )
        err_depth_fit = depth_err(fitted)
        err_rgb_fit = depth_err(fitted_rgb)
        assert err_depth_fit < 0.35 * init_err, (init_err, err_depth_fit)
        assert err_depth_fit < 0.6 * err_rgb_fit, (err_rgb_fit, err_depth_fit)

    def test_depth_targets_reject_oracle(self, key):
        from splat_renderer_tpu.fit import fit_splats

        _, camera, splats = _scene_and_splats(key, n=50)
        t = jnp.zeros((CFG.height, CFG.width, 3))
        d = jnp.zeros((CFG.height, CFG.width))
        with pytest.raises(ValueError):
            fit_splats(splats, [camera], [t], CFG, steps=1,
                       method="oracle", depth_targets=[d])


class TestPallasDepth:
    """The kernel pair's expected-depth channel (4th premultiplied channel,
    ops/tile_blend_diff.py) against the FD-verified tiles G-buffer."""

    def test_gbuffer_matches_tiles(self, key):
        from splat_renderer_tpu.render import render_diff_gbuffer

        _, camera, splats = _scene_and_splats(key, n=250)
        gb_t = render_diff_gbuffer(splats, camera, CFG, method="tiles")
        gb_p = render_diff_gbuffer(splats, camera, CFG, method="pallas",
                                   interpret=True)
        for k in ("rgb", "depth", "alpha"):
            np.testing.assert_allclose(
                np.asarray(gb_p[k]), np.asarray(gb_t[k]), atol=3e-5,
                err_msg=k,
            )

    def test_depth_gradients_match_tiles(self, key):
        """A masked depth-L1 + color loss: every field's gradient through
        the kernel's depth channel must match the scan path."""
        from splat_renderer_tpu.render import render_diff_gbuffer

        _, camera, splats = _scene_and_splats(key, n=150)
        gb0 = render_diff_gbuffer(splats, camera, CFG, method="tiles")
        dt = jnp.where(gb0["alpha"] > 0.5, gb0["depth"] + 0.05, 0.0)
        mask = (dt > 0.0).astype(jnp.float32)
        target = jnp.full((CFG.height, CFG.width, 3), 0.4)
        fields = ("px", "py", "pz", "radius", "opacity", "cr")

        def make_loss(method):
            def f(theta):
                gb = render_diff_gbuffer(dict(splats, **theta), camera, CFG,
                                         method=method, interpret=True)
                l_rgb = jnp.mean((gb["rgb"] - target) ** 2)
                l_d = jnp.sum(jnp.abs(gb["depth"] - dt) * mask) / jnp.sum(mask)
                return l_rgb + l_d
            return f

        theta = {k: splats[k] for k in fields}
        gt = jax.grad(make_loss("tiles"))(theta)
        gp = jax.grad(make_loss("pallas"))(theta)
        for k in fields:
            a, b = np.asarray(gt[k]), np.asarray(gp[k])
            scale = np.abs(a).max() + 1e-12
            assert np.isfinite(b).all(), k
            assert np.abs(a - b).max() / scale < 1e-3, (
                f"{k}: maxrel {np.abs(a - b).max() / scale:.2e}"
            )

    def test_depth_gradient_matches_finite_differences_pallas(self, key):
        """FD gate directly on the kernel path (not just tiles-parity)."""
        from splat_renderer_tpu.render import render_diff_gbuffer

        _, camera, splats = _scene_and_splats(key, n=80)
        gb0 = render_diff_gbuffer(splats, camera, CFG, method="pallas",
                                  interpret=True)
        dt = jnp.where(gb0["alpha"] > 0.5, gb0["depth"] + 0.05, 0.0)
        mask = (dt > 0.0).astype(jnp.float32)

        @jax.jit
        def loss(pz):
            gb = render_diff_gbuffer(dict(splats, pz=pz), camera, CFG,
                                     method="pallas", interpret=True)
            return jnp.sum(jnp.abs(gb["depth"] - dt) * mask) / jnp.sum(mask)

        g = jax.jit(jax.grad(loss))(splats["pz"])
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0
        idx = np.argsort(-np.abs(np.asarray(g)))[:3]
        eps = 1e-3
        ok = 0
        for i in idx:
            e = jnp.zeros_like(splats["pz"]).at[i].set(eps)
            fd = (loss(splats["pz"] + e) - loss(splats["pz"] - e)) / (2 * eps)
            if float(fd) == pytest.approx(float(g[i]), rel=0.2, abs=1e-9):
                ok += 1
        assert ok >= 2

    def test_fit_depth_supervision_pallas(self, key):
        """fit_splats(depth_targets=..., method='pallas') descends."""
        from splat_renderer_tpu.fit import fit_splats
        from splat_renderer_tpu.render import render_diff, render_diff_gbuffer

        _, camera, splats = _scene_and_splats(key, n=150)
        gb = render_diff_gbuffer(splats, camera, CFG, method="pallas",
                                 interpret=True)
        target = render_diff(splats, camera, CFG, method="pallas",
                             interpret=True)
        pz_off = {"pz": splats["pz"] + 0.05}
        start = dict(splats, **pz_off)
        fitted, losses = fit_splats(
            start, [camera], [target], CFG,
            fields=("px", "py", "pz"), steps=25, lr=8e-3, method="pallas",
            depth_targets=[gb["depth"]], depth_weight=1.0,
        )
        assert float(losses[-1]) < float(losses[0]) * 0.6


class TestRectTilesDiff:
    """The differentiable chain at rectangular tile geometry (the kernels
    share _tile_pixel_coords with the forward path — see
    tests/test_render.py::TestRectangularTiles for the forward gates)."""

    RCFG = RenderConfig(width=64, height=64, base_radius=0.08,
                        tiles_per_splat_cap=4, tile_size=32, tile_height=16)

    def test_pallas_matches_tiles_and_oracle(self, key):
        _, camera, splats = _scene_and_splats(key, n=200, cfg=self.RCFG)
        img_o = np.asarray(render_diff(splats, camera, self.RCFG,
                                       method="oracle"))
        img_t = np.asarray(render_diff(splats, camera, self.RCFG,
                                       method="tiles"))
        img_p = np.asarray(render_diff(splats, camera, self.RCFG,
                                       method="pallas", interpret=True))
        np.testing.assert_allclose(img_t, img_o, atol=3e-5)
        np.testing.assert_allclose(img_p, img_o, atol=3e-5)

    def test_gradients_match_tiles(self, key):
        _, camera, splats = _scene_and_splats(key, n=120, cfg=self.RCFG)
        target = jnp.full((self.RCFG.height, self.RCFG.width, 3), 0.4)
        fields = ("px", "py", "pz", "radius", "opacity", "cr")

        def make_loss(method):
            def f(theta):
                img = render_diff(dict(splats, **theta), camera, self.RCFG,
                                  method=method, interpret=True)
                return jnp.mean((img - target) ** 2)
            return f

        theta = {k: splats[k] for k in fields}
        gt = jax.grad(make_loss("tiles"))(theta)
        gp = jax.grad(make_loss("pallas"))(theta)
        for k in fields:
            a, b = np.asarray(gt[k]), np.asarray(gp[k])
            scale = np.abs(a).max() + 1e-12
            assert np.isfinite(b).all(), k
            assert np.abs(a - b).max() / scale < 1e-3, (
                f"{k}: maxrel {np.abs(a - b).max() / scale:.2e}"
            )
