"""Dataset IO: PNG reader (write_png's inverse + external files) and the
fit-from-disk loop (datagen --gbuffer -> load_dataset -> fit_splats)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu.utils.image import (
    load_image,
    read_png,
    write_png,
    write_png16,
)


class TestReadPng:
    def test_write_png_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
        for fast in (True, False):  # filter 1 (Sub) and filter 0 paths
            p = str(tmp_path / f"rt_{fast}.png")
            write_png(p, arr, fast=fast)
            np.testing.assert_array_equal(read_png(p), arr)

    def test_write_png16_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 65536, size=(7, 11), dtype=np.uint16)
        p = str(tmp_path / "rt16.png")
        write_png16(p, arr)
        np.testing.assert_array_equal(read_png(p), arr)

    def test_external_encoder_filters(self, tmp_path):
        """PIL chooses adaptive per-row filters (incl. Up/Average/Paeth) —
        an independent encoder gating the full filter decoder."""
        Image = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(2)
        # smooth gradient + noise: drives the encoder to mix filter types
        y, x = np.mgrid[0:33, 0:45]
        base = (x * 3 + y * 5) % 256
        arr = np.clip(
            base[:, :, None] + rng.integers(0, 40, (33, 45, 3)), 0, 255
        ).astype(np.uint8)
        p = str(tmp_path / "pil.png")
        Image.fromarray(arr).save(p, optimize=True)
        np.testing.assert_array_equal(read_png(p), arr)

    def test_external_rgba_and_gray(self, tmp_path):
        Image = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(3)
        rgba = rng.integers(0, 256, size=(8, 9, 4), dtype=np.uint8)
        gray = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
        p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "g.png")
        Image.fromarray(rgba, "RGBA").save(p1)
        Image.fromarray(gray, "L").save(p2)
        np.testing.assert_array_equal(read_png(p1), rgba)
        np.testing.assert_array_equal(read_png(p2), gray)
        # load_image: RGBA drops alpha, gray broadcasts, both land in [0,1]
        np.testing.assert_allclose(
            load_image(p1), rgba[:, :, :3].astype(np.float32) / 255.0
        )
        assert load_image(p2).shape == (8, 9, 3)


class TestLoadDataset:
    @pytest.fixture(scope="class")
    def dataset_dir(self, tmp_path_factory):
        import datagen

        out = tmp_path_factory.mktemp("ds")
        argv = [
            "datagen.py", "--out", str(out), "--views", "3", "--steps", "1",
            "--points", "400", "--width", "48", "--height", "48",
            "--base-radius", "0.08", "--gbuffer",
        ]
        old = sys.argv
        sys.argv = argv
        try:
            datagen.main()
        finally:
            sys.argv = old
        return str(out)

    def test_channels_and_cameras(self, dataset_dir):
        ds = spt.load_dataset(dataset_dir, gbuffer=True)
        assert len(ds["cameras"]) == len(ds["images"]) == 3
        assert ds["images"][0].shape == (48, 48, 3)
        assert ds["depth"][0].shape == (48, 48)
        assert ds["alpha"][0].shape == (48, 48)
        for cam in ds["cameras"]:
            assert cam["view_proj"].shape == (4, 4)
            assert cam["cam_pos"].shape == (3,)
        # depth is denormalized to metric camera distance
        d0 = np.asarray(ds["depth"][0])
        a0 = np.asarray(ds["alpha"][0])
        hit = a0 > 0.5
        assert hit.any()
        lo = ds["frames"][0]["depth_min"]
        hi = ds["frames"][0]["depth_max"]
        assert d0[hit].min() >= lo - 1e-3 and d0[hit].max() <= hi + 1e-3
        np.testing.assert_allclose(d0[a0 <= 1e-6], 0.0)
        cams, targets = spt.stack_views(ds)
        assert cams["view_proj"].shape == (3, 4, 4)
        assert targets.shape == (3, 48, 48, 3)

    def test_reload_matches_render(self, dataset_dir, key):
        """The written-then-read target is the render up to u8 rounding:
        regenerate the same splats/camera and compare."""
        import math

        from splat_renderer_tpu.render import render_splats
        from splat_renderer_tpu.render.pipeline import model_points

        ds = spt.load_dataset(dataset_dir)
        s1 = spt.Sphere(id="sphere1", radius=0.5)
        b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
        s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
        scene = spt.SDFScene(
            spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2)
        )
        # datagen step 0 state (t=0): sphere1 y = cos(0)*0.2... see datagen
        t = 0.0
        s1.position[0] = math.sin(t) * 0.3
        s1.position[1] = math.cos(t * 0.7) * 0.2
        s2.radius = 0.25 + 0.1 * math.sin(t * 2)
        rcfg = spt.RenderConfig(width=48, height=48, base_radius=0.08,
                                tiles_per_splat_cap=8)
        splats = model_points(scene, scene.params(), jax.random.PRNGKey(0),
                              400, spt.PointConfig(), rcfg)
        img = render_splats(splats, ds["cameras"][0], rcfg, "tiles")
        diff = np.abs(np.asarray(img) - np.asarray(ds["images"][0]))
        assert diff.max() <= 0.5 / 255.0 + 5e-3, diff.max()

    def test_fit_from_disk(self, dataset_dir, key):
        """The loop the loader exists for: train appearance against files."""
        from splat_renderer_tpu.fit import fit_splats
        from splat_renderer_tpu.render.pipeline import model_points

        ds = spt.load_dataset(dataset_dir)
        rcfg = spt.RenderConfig(width=48, height=48, base_radius=0.08,
                                tiles_per_splat_cap=8)
        s1 = spt.Sphere(id="sphere1", radius=0.5)
        b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
        s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
        scene = spt.SDFScene(
            spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2)
        )
        s1.position[1] = 0.2  # datagen t=0 pose
        splats = model_points(scene, scene.params(), jax.random.PRNGKey(0),
                              400, spt.PointConfig(), rcfg)
        gray = {k: jnp.full_like(splats[k], 0.5)
                for k in ("cr", "cg", "cb")}
        fitted, losses = fit_splats(
            splats, ds["cameras"][:2], ds["images"][:2], rcfg,
            fields=("cr", "cg", "cb"), steps=8, lr=0.1, method="tiles",
            init=gray,
        )
        assert float(losses[-1]) < 0.7 * float(losses[0])


class TestBackproject:
    """G-buffer -> splat point cloud (data.backproject_gbuffer): the 3DGS
    init-from-points equivalent, recovered from the dataset itself."""

    @pytest.fixture(scope="class")
    def fine_ds(self, tmp_path_factory):
        import datagen

        out = tmp_path_factory.mktemp("ds96")
        argv = [
            "datagen.py", "--out", str(out), "--views", "2", "--steps", "1",
            "--points", "4000", "--width", "96", "--height", "96",
            "--base-radius", "0.035", "--gbuffer",
        ]
        old = sys.argv
        sys.argv = argv
        try:
            datagen.main()
        finally:
            sys.argv = old
        return spt.load_dataset(str(out), gbuffer=True)

    def _scene_t0(self):
        import math

        s1 = spt.Sphere(id="sphere1", radius=0.5)
        s1.position[1] = math.cos(0.0) * 0.2
        b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
        s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
        return spt.SDFScene(
            spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2)
        )

    def test_points_on_surface_with_normals(self, fine_ds):
        splats = spt.backproject_gbuffer(fine_ds)
        n = splats["px"].shape[0]
        assert n > 500
        for k in ("px", "py", "pz", "nx", "ny", "nz", "cr", "cg", "cb",
                  "radius", "opacity"):
            assert splats[k].shape == (n,), k
        scene = self._scene_t0()
        p = jnp.stack([splats["px"], splats["py"], splats["pz"]], -1)
        d, g = scene.sdf(p, scene.params())
        ad = np.abs(np.asarray(d))
        # measured on this config: p50 ~ 0.010, 98% within 0.05 (the depth
        # channel is the alpha-weighted EXPECTED depth of finite-radius
        # splats, not a ray hit — sub-splat-radius bias is inherent)
        assert np.percentile(ad, 50) < 0.03
        assert (ad < 0.05).mean() > 0.9
        gn = np.array(g)
        gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-9)
        nrm = np.stack([np.asarray(splats[k]) for k in ("nx", "ny", "nz")], 1)
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                                   atol=1e-4)
        cos = (nrm * gn).sum(1)
        assert cos.mean() > 0.55  # measured ~0.73
        # subsampling is deterministic and bounded
        small = spt.backproject_gbuffer(fine_ds, n_max=200)
        assert small["px"].shape == (200,)

    def test_fit_from_backprojection(self, fine_ds):
        """The full from-files loop: init geometry from the G-buffer, train
        appearance against the images — no scene access anywhere."""
        from splat_renderer_tpu.fit import fit_splats

        splats = spt.backproject_gbuffer(fine_ds, n_max=1500)
        cfg = spt.RenderConfig(width=96, height=96, tiles_per_splat_cap=8)
        gray = {k: jnp.full_like(splats[k], 0.5) for k in ("cr", "cg", "cb")}
        fitted, losses = fit_splats(
            splats, fine_ds["cameras"], fine_ds["images"], cfg,
            fields=("cr", "cg", "cb"), steps=16, lr=0.1, method="tiles",
            init=gray,
        )
        # the color-only fit floors at the init's geometric mismatch
        # (~0.016 measured here); the signal is the descent itself
        assert float(losses[-1]) < 0.7 * float(losses[0])


class TestTransforms:
    """NeRF-standard transforms.json interop (data.load_transforms)."""

    def _make_nerf_dataset(self, out, key, n_views=2, size=64):
        """Author a transforms.json dataset from OUR cameras + renders:
        c2w = inv(view) (both are OpenGL-convention), RGBA images with
        straight alpha from the G-buffer."""
        import json
        import math
        import os

        Image = pytest.importorskip("PIL.Image")
        from splat_renderer_tpu.render import render_gbuffer
        from splat_renderer_tpu.render.pipeline import model_points

        scene = spt.SDFScene(
            spt.union(spt.Sphere(id="a", radius=0.5),
                      spt.Sphere(id="b", radius=0.4))
        )
        cfg = spt.RenderConfig(width=size, height=size, base_radius=0.06)
        splats = model_points(scene, scene.params(), key, 600,
                              spt.PointConfig(), cfg)
        frames = []
        cams = []
        for v in range(n_views):
            cam = spt.Camera(azimuth=0.4 + 2.4 * v, elevation=0.3,
                             aspect=1.0)
            arrs = {k: jnp.asarray(a) for k, a in cam.arrays().items()}
            gb = jax.jit(lambda s, c: render_gbuffer(s, c, cfg))(splats, arrs)
            a = np.asarray(gb["alpha"])[:, :, None]
            # the engine composites its background into "rgb"
            # (compositor.tiles_to_image) — un-composite to premultiplied,
            # then to the straight alpha an RGBA file stores
            premult = np.asarray(gb["rgb"]) - (1.0 - a) * np.asarray(
                cfg.background, np.float32
            )
            straight = np.where(a > 1e-6, premult / np.maximum(a, 1e-6), 0.0)
            rgba = np.concatenate([np.clip(straight, 0, 1), a], -1)
            name = f"r_{v}.png"
            Image.fromarray((rgba * 255 + 0.5).astype(np.uint8),
                            "RGBA").save(os.path.join(out, name))
            frames.append({"file_path": f"./r_{v}",  # extensionless (NeRF)
                           "transform_matrix":
                           np.linalg.inv(cam.view_matrix()).tolist()})
            cams.append((cam, arrs, premult, a[:, :, 0]))
        fov_y = math.radians(45.0)
        meta = {"camera_angle_x": 2 * math.atan(math.tan(fov_y / 2)),
                "frames": frames}
        with open(os.path.join(out, "transforms.json"), "w") as f:
            json.dump(meta, f)
        return cams, splats, cfg

    def test_roundtrip_convention(self, tmp_path, key):
        cams, splats, cfg = self._make_nerf_dataset(str(tmp_path), key)
        ds = spt.load_dataset(str(tmp_path))  # auto-detects transforms.json
        assert len(ds["cameras"]) == 2
        assert abs(ds["fov_deg"] - 45.0) < 1e-4
        for (cam, arrs, premult, alpha), lc, img, la in zip(
            cams, ds["cameras"], ds["images"], ds["alpha"]
        ):
            # the loader's view_proj reproduces ours (same GL convention)
            np.testing.assert_allclose(
                np.asarray(lc["view_proj"]), np.asarray(arrs["view_proj"]),
                atol=2e-4,
            )
            np.testing.assert_allclose(
                np.asarray(lc["cam_pos"]), np.asarray(arrs["cam_pos"]),
                atol=1e-5,
            )
            # image composites the straight-alpha file over white =
            # premultiplied render + (1 - alpha) * white
            want = premult + (1.0 - alpha[:, :, None])
            got = np.asarray(img)
            assert np.abs(got - np.clip(want, 0, 1)).max() < 2.5 / 255.0
            np.testing.assert_allclose(np.asarray(la), alpha,
                                       atol=1.5 / 255.0)

    def test_render_from_loaded_camera(self, tmp_path, key):
        """The conventions gate end-to-end: rendering through the LOADED
        camera reproduces the dataset image over black."""
        from splat_renderer_tpu.render import render_splats

        cams, splats, cfg = self._make_nerf_dataset(str(tmp_path), key)
        # composite over the ENGINE's background so the loaded target and
        # the re-render share compositing semantics
        ds = spt.load_transforms(str(tmp_path / "transforms.json"),
                                 bg=cfg.background)
        img = render_splats(splats, ds["cameras"][0], cfg, "tiles")
        diff = np.abs(np.asarray(img) - np.asarray(ds["images"][0]))
        # u8 RGBA roundtrip + straight/premultiplied conversion noise at
        # thin-alpha pixels
        assert np.percentile(diff, 99) < 4.0 / 255.0, diff.max()
