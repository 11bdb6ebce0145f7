"""Why does the plane words path still cost ~3 ms? (speed-of-light ~0.1 ms)

Isolates: raw plane read+write traffic (1D vs (rows, 128) 2D shapes), the
projection math alone, quantize+pack alone, and fusion behavior.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_project2.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from splat_renderer_tpu.utils.timing import time_fn

N = 1_048_576  # 2^20, divisible by 1024


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 11)
    names = ["px", "py", "pz", "radius", "cr", "cg", "cb", "op", "nx", "ny", "nz"]
    planes = {n: jax.random.uniform(k, (N,), jnp.float32) for n, k in zip(names, ks)}
    vp = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)), jnp.float32)
    cam = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)

    # 1) raw traffic, 1D shapes: read 11 planes, write 11
    def copy1d(p):
        return {k: v + 1.0 for k, v in p.items()}

    t, _ = time_fn(jax.jit(copy1d), planes, warmup=2, iters=10)
    print(f"copy 11 planes (N,) 1D      : {t*1e3:7.3f} ms")

    planes2 = {k: v.reshape(N // 1024, 1024) for k, v in planes.items()}
    planes2 = jax.block_until_ready(planes2)

    def copy2d(p):
        return {k: v + 1.0 for k, v in p.items()}

    t, _ = time_fn(jax.jit(copy2d), planes2, warmup=2, iters=10)
    print(f"copy 11 planes (r,1024) 2D  : {t*1e3:7.3f} ms")

    # 2) reshape cost: (N,) -> (rows, 1024) inside jit
    def reshape_all(p):
        return {k: v.reshape(N // 1024, 1024) + 1.0 for k, v in p.items()}

    t, _ = time_fn(jax.jit(reshape_all), planes, warmup=2, iters=10)
    print(f"reshape+copy 1D->2D         : {t*1e3:7.3f} ms")

    # 3) projection math only (cx, cy, depth, radius: 4 outputs)
    def proj_math(p, shape2=False):
        px, py, pz, r = p["px"], p["py"], p["pz"], p["radius"]
        clip = [vp[j, 0] * px + vp[j, 1] * py + vp[j, 2] * pz + vp[j, 3]
                for j in range(4)]
        w = clip[3]
        sw = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        cx = (clip[0] / sw + 1.0) * 960.0
        cy = (1.0 - clip[1] / sw) * 540.0
        dx, dy, dz = px - cam[0], py - cam[1], pz - cam[2]
        depth = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        rad = jnp.zeros_like(depth)
        valid = w > 1e-6
        for axis in range(3):
            col = vp[:, axis]
            for sign in (1.0, -1.0):
                sr = sign * r
                wp = clip[3] + sr * col[3]
                valid = valid & (wp > 1e-6)
                swp = jnp.where(jnp.abs(wp) < 1e-8, 1e-8, wp)
                sx = ((clip[0] + sr * col[0]) / swp + 1.0) * 960.0
                sy = (1.0 - (clip[1] + sr * col[1]) / swp) * 540.0
                rad = jnp.maximum(rad, jnp.sqrt((sx - cx) ** 2 + (sy - cy) ** 2))
        depth = jnp.where(valid, depth, jnp.inf)
        return cx, cy, depth, jnp.where(valid, rad, 0.0)

    t, _ = time_fn(jax.jit(proj_math), planes, warmup=2, iters=10)
    print(f"projection math 1D          : {t*1e3:7.3f} ms")

    t, _ = time_fn(jax.jit(proj_math), planes2, warmup=2, iters=10)
    print(f"projection math 2D          : {t*1e3:7.3f} ms")

    # 4) quantize+pack only
    def qpack(p):
        q = lambda v: jnp.round(jnp.clip((v + 256.0) * 32.0, 0, 65535)).astype(jnp.uint32)
        c8 = lambda v: jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        w_pos = q(p["px"]) | (q(p["py"]) << 16)
        w_rgb = c8(p["cr"]) | (c8(p["cg"]) << 8) | (c8(p["cb"]) << 16) | (c8(p["op"]) << 24)
        w_ro = q(p["radius"])
        return w_pos, w_ro, w_rgb

    t, _ = time_fn(jax.jit(qpack), planes, warmup=2, iters=10)
    print(f"quantize+pack 1D            : {t*1e3:7.3f} ms")
    t, _ = time_fn(jax.jit(qpack), planes2, warmup=2, iters=10)
    print(f"quantize+pack 2D            : {t*1e3:7.3f} ms")

    # 5) full words path on 2D reshaped planes (math+quantize+pack fused)
    def full2(p):
        cx, cy, depth, rad = proj_math(p)
        q = lambda v: jnp.round(jnp.clip((v + 256.0) * 32.0, 0, 65535)).astype(jnp.uint32)
        c8 = lambda v: jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        w_pos = q(cx) | (q(cy) << 16)
        w_ro = q(rad)
        w_rgb = c8(p["cr"]) | (c8(p["cg"]) << 8) | (c8(p["cb"]) << 16) | (c8(p["op"]) << 24)
        dk = jax.lax.bitcast_convert_type(depth, jnp.uint32)
        return dk, w_pos, w_ro, w_rgb

    t, _ = time_fn(jax.jit(full2), planes, warmup=2, iters=10)
    print(f"full words-ish 1D           : {t*1e3:7.3f} ms")
    t, _ = time_fn(jax.jit(full2), planes2, warmup=2, iters=10)
    print(f"full words-ish 2D           : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
