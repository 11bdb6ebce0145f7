"""Projection-stage breakdown at 1M splats: where do the ~3 ms go?

Speed-of-light is ~0.1 ms (read 44 MB, write 20 MB at ~800 GB/s): the stage
is pure elementwise math + one rank-4 contraction.  Suspects: (N, 3)/(N, 4)
minor-dim-3 intermediates (lane-padded layouts + strided column slices) and
the 6-offset radius loop's (N, 4) temporaries.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_project.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig, RenderConfig
from splat_renderer_tpu.render.pipeline import model_points
from splat_renderer_tpu.render.projector import project_splats, splat_screen_words
from splat_renderer_tpu.utils.timing import time_fn

N = 1_000_000
rcfg = RenderConfig(width=1920, height=1080, base_radius=0.008,
                    tiles_per_splat_cap=4)


def main():
    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    cam = spt.Camera(aspect=1920 / 1080)
    camera = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, N, PointConfig(), rcfg)
    )(scene.params(), jax.random.PRNGKey(0))

    # full words path (what bench times as "project")
    def words_fn(s, c):
        proj = project_splats(c["view_proj"], c["cam_pos"], s["position"],
                              s["radius"], rcfg)
        return splat_screen_words(
            proj, s["color"], s["opacity"], s["normal"], rcfg,
            view_proj=c["view_proj"], cam_pos=c["cam_pos"],
            positions=s["position"], radii=s["radius"],
        )

    t, _ = time_fn(jax.jit(words_fn), splats, camera, warmup=2, iters=10)
    print(f"full words path        : {t*1e3:7.3f} ms")

    # projection alone
    t, _ = time_fn(
        jax.jit(lambda s, c: project_splats(c["view_proj"], c["cam_pos"],
                                            s["position"], s["radius"], rcfg)),
        splats, camera, warmup=2, iters=10)
    print(f"project_splats alone   : {t*1e3:7.3f} ms")

    # plane-SoA variant: split (N, 3) columns ONCE, all math on (N,) planes
    def words_planes(s, c):
        vp = c["view_proj"]
        px, py, pz = (s["position"][:, k] for k in range(3))
        r = s["radius"]
        cpx, cpy, cpz = c["cam_pos"]
        clip = [vp[j, 0] * px + vp[j, 1] * py + vp[j, 2] * pz + vp[j, 3]
                for j in range(4)]
        w = clip[3]
        safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        half_w, half_h = 0.5 * rcfg.width, 0.5 * rcfg.height
        cx = (clip[0] / safe_w + 1.0) * half_w
        cy = (1.0 - clip[1] / safe_w) * half_h
        depth = jnp.sqrt((px - cpx) ** 2 + (py - cpy) ** 2 + (pz - cpz) ** 2)
        valid = w > 1e-6
        radius = jnp.zeros_like(depth)
        for axis in range(3):
            col = vp[:, axis]
            for sign in (1.0, -1.0):
                sr = sign * r
                wp = clip[3] + sr * col[3]
                valid = valid & (wp > 1e-6)
                swp = jnp.where(jnp.abs(wp) < 1e-8, 1e-8, wp)
                sx = ((clip[0] + sr * col[0]) / swp + 1.0) * half_w
                sy = (1.0 - (clip[1] + sr * col[1]) / swp) * half_h
                radius = jnp.maximum(
                    radius, jnp.sqrt((sx - cx) ** 2 + (sy - cy) ** 2))
        k = max(int(rcfg.tiles_per_splat_cap ** 0.5), 2)
        r_max = (k - 1) * rcfg.tile_size / (2.0 * rcfg.bounds_margin)
        radius = jnp.where(valid, jnp.minimum(radius, r_max), 0.0)
        depth = jnp.where(valid, depth, jnp.inf)
        # appearance
        nx, ny, nz = (s["normal"][:, k] for k in range(3))
        light = np.asarray(rcfg.light_dir, np.float32)
        light = light / np.linalg.norm(light)
        diffuse = jnp.maximum(nx * light[0] + ny * light[1] + nz * light[2], 0.0)
        lamb = rcfg.light_ambient + rcfg.light_diffuse * diffuse
        ps, po = rcfg.pos_scale, rcfg.pos_offset
        from splat_renderer_tpu.render.packing import COLOR_SCALE, POS_MAX, depth_bits
        qp = lambda v: jnp.round(jnp.clip((v + po) * ps, 0, POS_MAX)).astype(jnp.uint32)
        c8 = lambda v: jnp.round(jnp.clip(v, 0.0, 1.0) * COLOR_SCALE).astype(jnp.uint32)
        rgb = [c8(s["color"][:, k] * lamb) for k in range(3)]
        return {
            "dk": depth_bits(depth),
            "w_pos": qp(cx) | (qp(cy) << 16),
            "w_ro": jnp.round(jnp.clip(radius * ps, 0, POS_MAX)).astype(jnp.uint32)
            | (jnp.uint32(0) << 16) | (jnp.uint32(255) << 24),
            "w_rgb": rgb[0] | (rgb[1] << 8) | (rgb[2] << 16)
            | (c8(s["opacity"]) << 24),
        }

    t, wp = time_fn(jax.jit(words_planes), splats, camera, warmup=2, iters=10)
    print(f"plane-SoA variant      : {t*1e3:7.3f} ms")

    # sanity: positions/colors agree with the reference path
    ref = jax.jit(words_fn)(splats, camera)
    wpos_ok = np.array_equal(np.asarray(ref["w_pos"]), np.asarray(wp["w_pos"]))
    dk_ok = np.array_equal(np.asarray(ref["dk"]), np.asarray(wp["dk"]))
    print(f"   w_pos bit-equal: {wpos_ok}   dk bit-equal: {dk_ok}")

    # column-extraction cost alone
    def cols(s):
        return tuple(s["position"][:, k] + 0.0 for k in range(3))

    t, _ = time_fn(jax.jit(cols), splats, warmup=2, iters=10)
    print(f"(N,3) column slices    : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
