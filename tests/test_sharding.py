"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The distributed-correctness analogue of the reference's (nonexistent) test
story: sharded execution must be bit-compatible (within fp32 reassociation
tolerance) with single-device execution (SURVEY.md section 4 item 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.parallel import (
    make_mesh,
    multichip_frame_fn,
    render_views_data_parallel,
)
from splat_renderer_tpu.render import bin_splats, depth_sort, render_tiles
from splat_renderer_tpu.render.pipeline import model_points, splat_screen_data


def _scene():
    return spt.SDFScene(
        spt.smooth_union(
            0.15,
            spt.Sphere(id="s1", radius=0.5),
            spt.Box(id="b1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3)),
        )
    )


def _cameras(v, aspect):
    arrs = spt.orbit_ring(v, aspect=aspect)
    return {k: jnp.asarray(a) for k, a in arrs.items()}


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() >= 8

    def test_make_mesh_shapes(self):
        mesh = make_mesh(dp=4, sp=2)
        assert mesh.shape == {"dp": 4, "sp": 2}

    def test_make_mesh_too_many(self):
        with pytest.raises(ValueError):
            make_mesh(dp=16, sp=16)


class TestMultichipFrame:
    def test_dp4_sp2_runs_and_matches_band_structure(self, key):
        scene = _scene()
        rcfg = RenderConfig(width=64, height=64, base_radius=0.08)
        pcfg = PointConfig(descent_steps=3)
        mesh = make_mesh(dp=4, sp=2)
        fn = multichip_frame_fn(scene, mesh, n=1024, pcfg=pcfg, rcfg=rcfg)
        cams = _cameras(8, aspect=1.0)
        imgs = fn(scene.params(), cams, key)
        assert imgs.shape == (8, 64, 64, 3)
        imgs = np.asarray(imgs)
        assert np.all(np.isfinite(imgs))
        # every view shows the scene (not all background)
        bg = np.asarray(rcfg.background)
        for v in range(8):
            assert np.mean(np.abs(imgs[v] - bg)) > 1e-3, f"view {v} empty"

    def test_tile_band_sharding_matches_single_device(self, key):
        """sp-banded compositing must equal the unsharded render exactly
        (same splats, same per-band math)."""
        scene = _scene()
        rcfg = RenderConfig(width=64, height=64, base_radius=0.08)
        pcfg = PointConfig(descent_steps=3)

        # single-device reference with the same point layout as the mesh run:
        # 4 shards of 256 points each, seeded with fold_in(key, dev_id)
        # (64px / 16px tiles = 4 tile rows = max band split)
        mesh = make_mesh(dp=1, sp=4)
        fn = multichip_frame_fn(scene, mesh, n=1024, pcfg=pcfg, rcfg=rcfg)
        cams = _cameras(1, aspect=1.0)
        img_sharded = np.asarray(fn(scene.params(), cams, key)[0])

        params = scene.params()
        shards = []
        for d in range(4):
            k = jax.random.fold_in(key, d)
            shards.append(
                model_points(scene, params, k, 256, pcfg, rcfg)
            )
        splats = jax.tree.map(lambda *xs: jnp.concatenate(xs), *shards)
        camera = {k_: v[0] for k_, v in cams.items()}
        data = splat_screen_data(splats, camera, rcfg)
        _, _, ds = depth_sort(data[:, 7], data)
        img_ref = np.asarray(render_tiles(ds, bin_splats(ds, rcfg), rcfg))

        np.testing.assert_allclose(img_sharded, img_ref, atol=3e-5)

    def test_validation_errors(self):
        scene = _scene()
        rcfg = RenderConfig(width=64, height=48)  # tiles_y=3, not divisible by 2
        mesh = make_mesh(dp=1, sp=2)
        with pytest.raises(ValueError, match="divisible"):
            multichip_frame_fn(scene, mesh, n=1024, pcfg=PointConfig(), rcfg=rcfg)
        with pytest.raises(ValueError, match="divisible"):
            multichip_frame_fn(
                scene, make_mesh(dp=1, sp=2), n=1023, pcfg=PointConfig(),
                rcfg=RenderConfig(width=64, height=64),
            )


class TestViewDP:
    def test_eight_views_sharded_match_loop(self, rng):
        rcfg = RenderConfig(width=32, height=32)
        n, v = 64, 8
        data = np.zeros((v, n, 10), np.float32)
        data[..., 0] = rng.uniform(0, 32, (v, n))
        data[..., 1] = rng.uniform(0, 32, (v, n))
        data[..., 2] = rng.uniform(1, 6, (v, n))
        data[..., 3] = rng.uniform(0.2, 1.0, (v, n))
        data[..., 4:7] = rng.uniform(0, 1, (v, n, 3))
        data[..., 7] = rng.uniform(1, 9, (v, n))
        data[..., 9] = 1.0
        data = jnp.asarray(data)

        mesh = make_mesh(dp=8, sp=1)
        imgs = render_views_data_parallel(data, mesh, rcfg)
        assert imgs.shape == (8, 32, 32, 3)
        for i in range(v):
            _, _, ds = depth_sort(data[i, :, 7], data[i])
            ref = render_tiles(ds, bin_splats(ds, rcfg), rcfg)
            np.testing.assert_allclose(imgs[i], ref, atol=2e-5, err_msg=f"view {i}")


class TestBandParallel:
    """Rank-band splat-parallel compositing (parallel/band.py): shards the
    pair SORT and the blend by global depth band; must match single-device
    exactly (the over-merge across bands is the same 'over' algebra)."""

    def test_band_frame_matches_single_device(self, key):
        from splat_renderer_tpu.parallel import band_frame_fn, make_mesh
        from splat_renderer_tpu.render.binning import canonical_sort_data

        scene = _scene()
        rcfg = RenderConfig(width=64, height=64, base_radius=0.08,
                            tiles_per_splat_cap=4)
        pcfg = PointConfig(descent_steps=3)
        mesh = make_mesh(dp=1, sp=4)
        fn = band_frame_fn(scene, mesh, n=1024, pcfg=pcfg, rcfg=rcfg,
                           band_slack=2.0)
        camera = {k: v[0] for k, v in _cameras(1, aspect=1.0).items()}
        img_band, stats = fn(scene.params(), camera, key)
        assert not bool(stats["band_overflow"])
        assert int(stats["band_max_count"]) <= 2 * 256

        # single-device reference: same dev-major splat layout + fold keys
        params = scene.params()
        shards = [
            model_points(scene, params, jax.random.fold_in(key, d), 256,
                         pcfg, rcfg)
            for d in range(4)
        ]
        splats = jax.tree.map(lambda *xs: jnp.concatenate(xs), *shards)
        data = splat_screen_data(splats, camera, rcfg)
        ds = canonical_sort_data(data, rcfg)
        img_ref = np.asarray(render_tiles(ds, bin_splats(ds, rcfg), rcfg))
        np.testing.assert_allclose(np.asarray(img_band), img_ref, atol=3e-5)

    def test_band_overflow_flagged(self, key):
        """A tiny band capacity must flag overflow and still render finite
        (dropped records, never garbage)."""
        from splat_renderer_tpu.parallel import band_frame_fn, make_mesh

        scene = _scene()
        rcfg = RenderConfig(width=64, height=64, base_radius=0.08,
                            tiles_per_splat_cap=4)
        pcfg = PointConfig(descent_steps=2)
        mesh = make_mesh(dp=1, sp=2)
        fn = band_frame_fn(scene, mesh, n=512, pcfg=pcfg, rcfg=rcfg,
                           band_slack=0.05)
        camera = {k: v[0] for k, v in _cameras(1, aspect=1.0).items()}
        img, stats = fn(scene.params(), camera, key)
        assert bool(stats["band_overflow"])
        assert np.all(np.isfinite(np.asarray(img)))
