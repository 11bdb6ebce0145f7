"""Tests for view-dependent SH color (render/sh.py) and its .ply plumbing.

The basis is validated by mathematical properties that are independent of
how the polynomials were written down:

- orthonormality: E_dir[Y_i * Y_j] * 4pi = delta_ij under uniform sphere
  sampling (catches wrong normalization constants),
- the addition theorem: sum_m Y_lm(d)^2 = (2l+1)/4pi for EVERY direction
  (catches wrong polynomial forms within a band, pointwise).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import RenderConfig
from splat_renderer_tpu.render.pipeline import model_points, render_splats
from splat_renderer_tpu.render.sh import (
    SH_C0,
    SH_C1,
    apply_sh,
    sh_basis_planes,
    sh_degree,
)
from splat_renderer_tpu.utils.ply import load_ply, save_ply


def _dirs(key, n):
    v = jax.random.normal(key, (3, n))
    v = v / jnp.linalg.norm(v, axis=0, keepdims=True)
    return v[0], v[1], v[2]


class TestBasis:
    def test_orthonormal_under_sphere_measure(self, key):
        dx, dy, dz = _dirs(key, 500_000)
        basis = (jnp.full_like(dx, SH_C0),) + sh_basis_planes(dx, dy, dz, 3)
        B = np.asarray(jnp.stack(basis))  # (16, n)
        gram = 4.0 * np.pi * (B @ B.T) / B.shape[1]
        np.testing.assert_allclose(gram, np.eye(16), atol=0.06)

    def test_addition_theorem_pointwise(self, key):
        # sum_m Y_lm(d)^2 = (2l+1)/(4pi) at every direction
        dx, dy, dz = _dirs(key, 4096)
        basis = sh_basis_planes(dx, dy, dz, 3)
        bands = {1: basis[0:3], 2: basis[3:8], 3: basis[8:15]}
        for l, terms in bands.items():
            s = np.asarray(sum(t * t for t in terms))
            want = (2 * l + 1) / (4.0 * np.pi)
            np.testing.assert_allclose(s, want, rtol=1e-5)

    def test_degree_prefix_consistency(self, key):
        dx, dy, dz = _dirs(key, 128)
        b3 = sh_basis_planes(dx, dy, dz, 3)
        for deg, n in ((1, 3), (2, 8)):
            bd = sh_basis_planes(dx, dy, dz, deg)
            assert len(bd) == n
            for a, b in zip(bd, b3):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejects_unsupported_degree(self, key):
        dx, dy, dz = _dirs(key, 8)
        with pytest.raises(ValueError, match="unsupported"):
            sh_basis_planes(dx, dy, dz, 4)


def _base_splats(n=4, color=0.5):
    z = jnp.zeros(n)
    return {
        "px": z, "py": z, "pz": z, "radius": jnp.full(n, 0.1),
        "cr": jnp.full(n, color), "cg": jnp.full(n, color),
        "cb": jnp.full(n, color), "opacity": jnp.full(n, 0.7),
        "nx": z, "ny": z, "nz": jnp.ones(n),
    }


class TestApply:
    def test_none_and_zero_coeffs_clip_base(self):
        s = _base_splats(color=1.3)
        out = apply_sh(s, None, jnp.asarray([0.0, 0.0, -2.0]))
        np.testing.assert_allclose(np.asarray(out["cr"]), 1.0)
        zero = {c: jnp.zeros((3, 4)) for c in ("r", "g", "b")}
        out = apply_sh(s, zero, jnp.asarray([0.0, 0.0, -2.0]))
        np.testing.assert_allclose(np.asarray(out["cg"]), 1.0)
        # untouched fields pass through
        np.testing.assert_array_equal(np.asarray(out["opacity"]),
                                      np.asarray(s["opacity"]))

    def test_degree1_hand_value(self):
        # splat at origin, camera at -2z: dir = +z, so only the l=1 z-term
        # (coefficient row 1, value SH_C1) contributes
        s = _base_splats(color=0.5)
        sh = {c: jnp.zeros((3, 4)) for c in ("r", "g", "b")}
        sh["r"] = sh["r"].at[1].set(0.3)
        out = apply_sh(s, sh, jnp.asarray([0.0, 0.0, -2.0]))
        np.testing.assert_allclose(np.asarray(out["cr"]),
                                   0.5 + SH_C1 * 0.3, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["cb"]), 0.5)
        # opposite camera flips the band's sign
        out2 = apply_sh(s, sh, jnp.asarray([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(out2["cr"]),
                                   0.5 - SH_C1 * 0.3, rtol=1e-6)

    def test_degree_truncation(self):
        s = _base_splats()
        sh = {c: jnp.zeros((15, 4)) for c in ("r", "g", "b")}
        sh["g"] = sh["g"].at[5].set(1.0)  # an l=2 coefficient
        full = apply_sh(s, sh, jnp.asarray([1.0, 0.5, -2.0]))
        trunc = apply_sh(s, sh, jnp.asarray([1.0, 0.5, -2.0]), degree=1)
        assert sh_degree(sh) == 3
        assert float(jnp.abs(full["cg"] - 0.5).max()) > 1e-3
        np.testing.assert_allclose(np.asarray(trunc["cg"]), 0.5)

    def test_jit_no_retrace_on_camera_motion(self):
        s = _base_splats()
        sh = {c: jnp.ones((8, 4)) * 0.01 for c in ("r", "g", "b")}
        calls = []

        @jax.jit
        def f(s, sh, cp):
            calls.append(1)
            return apply_sh(s, sh, cp)["cr"]

        f(s, sh, jnp.asarray([0.0, 0.0, -2.0]))
        f(s, sh, jnp.asarray([1.0, 2.0, 3.0]))
        assert len(calls) == 1


class TestPlySH:
    def test_roundtrip_exact(self, key, tmp_path):
        n = 32
        s = _base_splats(n)
        rng = np.random.default_rng(3)
        sh = {c: jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
              for c in ("r", "g", "b")}
        p = str(tmp_path / "sh.ply")
        save_ply(p, s, sh=sh)
        back, sh2 = load_ply(p, with_sh=True)
        assert sh_degree(sh2) == 2
        for c in ("r", "g", "b"):
            np.testing.assert_array_equal(np.asarray(sh2[c]),
                                          np.asarray(sh[c]))
        # base colors unclipped in with_sh mode -> exact through f_dc
        np.testing.assert_allclose(np.asarray(back["cr"]),
                                   np.asarray(s["cr"]), atol=1e-6)

    def test_channel_major_foreign_layout(self, tmp_path):
        # hand-built file: f_rest_k = k so the channel-major split is visible
        n, m = 4, 3
        props = ["x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2"]
        props += [f"f_rest_{i}" for i in range(3 * m)]
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}"]
        header += [f"property float {p}" for p in props]
        header += ["end_header"]
        rec = np.zeros((n,), np.dtype([(p, "<f4") for p in props]))
        for i in range(3 * m):
            rec[f"f_rest_{i}"] = float(i)
        p = str(tmp_path / "cm.ply")
        with open(p, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            f.write(rec.tobytes())
        _, sh = load_ply(p, with_sh=True)
        assert sh["r"].shape == (m, n)
        np.testing.assert_allclose(np.asarray(sh["r"][:, 0]), [0.0, 1.0, 2.0])
        np.testing.assert_allclose(np.asarray(sh["g"][:, 0]), [3.0, 4.0, 5.0])
        np.testing.assert_allclose(np.asarray(sh["b"][:, 0]), [6.0, 7.0, 8.0])

    def test_incomplete_band_truncated(self, tmp_path):
        # 12 f_rest values = 4 per channel: not a complete degree-2 set,
        # loader keeps the complete degree-1 prefix (3 per channel)
        n = 2
        props = ["x", "y", "z"] + [f"f_rest_{i}" for i in range(12)]
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}"]
        header += [f"property float {p}" for p in props]
        header += ["end_header"]
        rec = np.zeros((n,), np.dtype([(p, "<f4") for p in props]))
        for i in range(12):
            rec[f"f_rest_{i}"] = float(i)
        p = str(tmp_path / "inc.ply")
        with open(p, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            f.write(rec.tobytes())
        _, sh = load_ply(p, with_sh=True)
        assert sh_degree(sh) == 1
        # channel starts follow the FILE's per-channel stride (4), rows
        # keep only the complete band
        np.testing.assert_allclose(np.asarray(sh["g"][:, 0]), [4.0, 5.0, 6.0])

    def test_no_rest_gives_none(self, key, tmp_path):
        s = _base_splats()
        p = str(tmp_path / "plain.ply")
        save_ply(p, s)
        back, sh = load_ply(p, with_sh=True)
        assert sh is None
        assert back["px"].shape[0] == 4

    def test_dead_slots_dropped_from_sh_too(self, tmp_path):
        n = 6
        s = _base_splats(n)
        s["radius"] = jnp.asarray([0.1, 0.0, 0.1, 0.0, 0.1, 0.1])
        sh = {c: jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32), (3, n))
              for c in ("r", "g", "b")}
        p = str(tmp_path / "dead.ply")
        save_ply(p, s, sh=sh)
        back, sh2 = load_ply(p, with_sh=True)
        assert back["px"].shape[0] == 4
        np.testing.assert_allclose(np.asarray(sh2["r"][0]),
                                   [0.0, 2.0, 4.0, 5.0])


class TestEndToEnd:
    def test_view_dependent_render(self, key):
        scene = spt.SDFScene(spt.Sphere(id="a", radius=0.5))
        cfg = RenderConfig(width=32, height=32, base_radius=0.05,
                           tiles_per_splat_cap=16)
        splats = model_points(scene, scene.params(), key, 128,
                              spt.PointConfig(), cfg)
        n = splats["px"].shape[0]
        sh = {c: jnp.zeros((3, n)) for c in ("r", "g", "b")}
        sh["r"] = sh["r"].at[2].set(0.8)  # l=1 x-band: -C1 * dir_x
        cams = {a: spt.Camera(aspect=1.0, azimuth=a) for a in (0.3, 0.3 + np.pi)}
        imgs = {}
        for a, cam in cams.items():
            arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
            lit = apply_sh(splats, sh, arr["cam_pos"])
            imgs[a] = render_splats(lit, arr, cfg, compositor="tiles")
        # opposite azimuths flip dir_x -> red channel shifts opposite ways
        reds = [float(jnp.mean(imgs[a][..., 0])) for a in cams]
        assert abs(reds[0] - reds[1]) > 0.01
        for img in imgs.values():
            assert bool(jnp.isfinite(img).all())
