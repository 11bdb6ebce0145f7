"""Tests for 3DGS .ply interchange (utils/ply.py): roundtrip fidelity,
foreign-file tolerance, and end-to-end render of a loaded scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import RenderConfig
from splat_renderer_tpu.points.properties import PLANE_FIELDS
from splat_renderer_tpu.render.pipeline import model_points, render_splats
from splat_renderer_tpu.utils.ply import PLY_THIN, SH_C0, load_ply, save_ply


def _splats(key, n=64):
    scene = spt.SDFScene(spt.Sphere(id="a", radius=0.5))
    cfg = RenderConfig(width=32, height=32, base_radius=0.05)
    return model_points(scene, scene.params(), key, n, spt.PointConfig(), cfg)


class TestRoundtrip:
    def test_fields_survive(self, key, tmp_path):
        splats = _splats(key)
        p = str(tmp_path / "s.ply")
        save_ply(p, splats)
        back = load_ply(p)
        assert set(back) == set(PLANE_FIELDS)
        for f in ("px", "py", "pz"):
            np.testing.assert_allclose(np.asarray(back[f]),
                                       np.asarray(splats[f]), atol=1e-6)
        # radius: in-plane scales are (r, r) -> geometric mean r
        np.testing.assert_allclose(np.asarray(back["radius"]),
                                   np.asarray(splats["radius"]),
                                   rtol=1e-4)
        for f in ("cr", "cg", "cb", "opacity"):
            np.testing.assert_allclose(np.asarray(back[f]),
                                       np.asarray(splats[f]), atol=1e-4)

    def test_normals_survive_exactly_not_just_up_to_sign(self, key, tmp_path):
        splats = _splats(key)
        p = str(tmp_path / "n.ply")
        save_ply(p, splats)
        back = load_ply(p)
        n0 = np.stack([np.asarray(splats[f]) for f in ("nx", "ny", "nz")], 1)
        n1 = np.stack([np.asarray(back[f]) for f in ("nx", "ny", "nz")], 1)
        np.testing.assert_allclose(n1, n0, atol=1e-5)

    def test_down_normal_degenerate_quaternion(self, tmp_path):
        # n = -z exercises the 180-degree-flip branch of save_ply
        splats = {
            "px": jnp.zeros(2), "py": jnp.zeros(2), "pz": jnp.zeros(2),
            "radius": jnp.full(2, 0.1), "cr": jnp.full(2, 0.5),
            "cg": jnp.full(2, 0.5), "cb": jnp.full(2, 0.5),
            "opacity": jnp.full(2, 0.7),
            "nx": jnp.asarray([0.0, 0.0]), "ny": jnp.asarray([0.0, 0.0]),
            "nz": jnp.asarray([-1.0, 1.0]),
        }
        p = str(tmp_path / "d.ply")
        save_ply(p, splats)
        back = load_ply(p)
        np.testing.assert_allclose(np.asarray(back["nz"]), [-1.0, 1.0],
                                   atol=1e-6)


class TestForeignFiles:
    def _write_3dgs(self, path, n=8, extra_rest=3, ascii_fmt=False):
        """A 'real' 3DGS export: f_rest_* bands present, anisotropic scales."""
        rng = np.random.default_rng(0)
        props = ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1",
                 "f_dc_2"]
        props += [f"f_rest_{i}" for i in range(extra_rest)]
        props += ["opacity", "scale_0", "scale_1", "scale_2",
                  "rot_0", "rot_1", "rot_2", "rot_3"]
        fmt = "ascii" if ascii_fmt else "binary_little_endian"
        header = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
        header += [f"property float {p}" for p in props]
        header += ["end_header"]
        rec = np.empty((n,), np.dtype([(p, "<f4") for p in props]))
        for p in props:
            rec[p] = rng.normal(size=n).astype(np.float32)
        # identity rotation, ordered scales: axis 2 smallest -> normal = +z
        rec["rot_0"], rec["rot_1"], rec["rot_2"], rec["rot_3"] = 1, 0, 0, 0
        rec["scale_0"] = np.log(0.2)
        rec["scale_1"] = np.log(0.1)
        rec["scale_2"] = np.log(0.01)
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            f.write(rec.tobytes())
        return rec

    def test_loads_full_3dgs_layout(self, tmp_path):
        p = str(tmp_path / "g.ply")
        rec = self._write_3dgs(p)
        s = load_ply(p)
        np.testing.assert_allclose(np.asarray(s["px"]), rec["x"], atol=1e-6)
        # normal = smallest-scale axis of the identity rotation = +z
        np.testing.assert_allclose(np.asarray(s["nz"]), 1.0, atol=1e-6)
        # radius = geomean of the two in-plane scales (0.2, 0.1)
        np.testing.assert_allclose(np.asarray(s["radius"]),
                                   np.sqrt(0.2 * 0.1), rtol=1e-5)
        # colors are the SH DC transform, clipped to [0, 1]
        want = np.clip(0.5 + SH_C0 * rec["f_dc_0"], 0, 1)
        np.testing.assert_allclose(np.asarray(s["cr"]), want, atol=1e-6)
        # opacity passes through the sigmoid
        want_op = 1 / (1 + np.exp(-rec["opacity"]))
        np.testing.assert_allclose(np.asarray(s["opacity"]), want_op,
                                   atol=1e-6)

    def test_skips_elements_before_vertex(self, tmp_path):
        # spec-valid file with a fixed-size element preceding vertex: the
        # loader must skip its bytes, not misread them as vertex data
        p = str(tmp_path / "pre.ply")
        n = 4
        header = [
            "ply", "format binary_little_endian 1.0",
            "element camera 1",
            "property float cx", "property float cy",
            f"element vertex {n}",
            "property float x", "property float y", "property float z",
            "end_header",
        ]
        cam = np.asarray([9.0, 9.0], "<f4")
        vert = np.arange(3 * n, dtype="<f4").reshape(n, 3)
        with open(p, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            f.write(cam.tobytes())
            f.write(vert.tobytes())
        s = load_ply(p)
        np.testing.assert_allclose(np.asarray(s["px"]), vert[:, 0])
        np.testing.assert_allclose(np.asarray(s["pz"]), vert[:, 2])

    def test_rejects_unskippable_list_element(self, tmp_path):
        p = str(tmp_path / "face.ply")
        header = [
            "ply", "format binary_little_endian 1.0",
            "element face 2",
            "property list uchar int vertex_indices",
            "element vertex 1",
            "property float x",
            "end_header",
        ]
        with open(p, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
        with pytest.raises(ValueError, match="list-typed"):
            load_ply(p)

    def test_export_drops_dead_slots(self, key, tmp_path):
        splats = {k: np.asarray(v).copy() for k, v in _splats(key).items()}
        splats = {k: jnp.asarray(v) for k, v in splats.items()}
        # kill half the slots the way density_control does
        radius = np.asarray(splats["radius"]).copy()
        radius[::2] = 0.0
        splats["radius"] = jnp.asarray(radius)
        p = str(tmp_path / "dead.ply")
        save_ply(p, splats)
        back = load_ply(p)
        assert back["px"].shape[0] == int((radius > 0).sum())
        assert float(np.min(np.asarray(back["radius"]))) > 0.0

    def test_rejects_ascii(self, tmp_path):
        p = str(tmp_path / "a.ply")
        self._write_3dgs(p, ascii_fmt=True)
        with pytest.raises(ValueError, match="binary_little_endian"):
            load_ply(p)

    def test_rejects_non_ply(self, tmp_path):
        p = tmp_path / "x.ply"
        p.write_bytes(b"not a ply\n")
        with pytest.raises(ValueError, match="not a PLY"):
            load_ply(str(p))


class TestEndToEnd:
    def test_loaded_scene_renders(self, key, tmp_path):
        splats = _splats(key, n=128)
        p = str(tmp_path / "r.ply")
        save_ply(p, splats)
        back = load_ply(p)
        cfg = RenderConfig(width=32, height=32, base_radius=0.05,
                           tiles_per_splat_cap=16)
        cam = {k: jnp.asarray(v)
               for k, v in spt.Camera(aspect=1.0).arrays().items()}
        img0 = render_splats(splats, cam, cfg, compositor="tiles")
        img1 = render_splats(back, cam, cfg, compositor="tiles")
        # quantized record grids absorb the float roundtrip
        assert float(jnp.abs(img1 - img0).max()) < 2e-2
