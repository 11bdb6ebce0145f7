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
