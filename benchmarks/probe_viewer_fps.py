"""Measured SERVED frame rate of the pipelined interactive viewer.

VERDICT round-2 item 9's done criterion: the viewer's delivered rate at 1M
splats must land within ~20% of the engine's own frame rate on chip (the
round-2 viewer serialized render -> PNG encode -> HTTP ship per GET, so its
perceived rate sat far below the engine's).  The round-3 server pipelines a
latest-wins render thread against the HTTP encode/ship threads and offers
raw-RGB transfer (viewer/serve.py), so served ~= engine is the expectation.

Method: start make_server on an ephemeral port with a 1M-splat SplatEngine
(turbo preset, the interactive profile), drive /frame?raw=1 from a client
loop that always requests a NEW camera state (seq chaining, like the
browser client), and compare:
  - engine_fps: Engine.frame timed directly (host loop, device_get'd)
  - served_fps: steady-state rate of delivered raw frames over HTTP

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/probe_viewer_fps.py [--n 1000000] [--frames 60]
"""

from __future__ import annotations

import argparse
import threading
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

import splat_renderer_tpu as spt
from splat_renderer_tpu.config import PointConfig
from splat_renderer_tpu.render.pipeline import SplatEngine, model_points
from splat_renderer_tpu.viewer.serve import make_server


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    s1 = spt.Sphere(id="sphere1", position=(0, 0, 0), radius=0.5)
    b1 = spt.Box(id="box1", position=(0.6, 0, 0), size=(0.3, 0.3, 0.3))
    s2 = spt.Sphere(id="sphere2", position=(0, 0.6, 0), radius=0.25)
    scene = spt.SDFScene(
        spt.smooth_union(0.1, spt.smooth_union(0.15, s1, b1), s2))
    rcfg = spt.turbo_render_config(1920, 1080, base_radius=0.008,
                                   tiles_per_splat_cap=4)
    splats = jax.jit(
        lambda p, k: model_points(scene, p, k, args.n, PointConfig(), rcfg)
    )(scene.params(), jax.random.PRNGKey(0))
    eng = SplatEngine(splats, rcfg)

    # ---- engine-only rate (host loop incl. device_get, like the sink) ----
    cam = spt.Camera(aspect=1920 / 1080)
    def cam_arrays(az):
        cam.azimuth = az
        return {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    np.asarray(eng.frame(cam_arrays(0.0), jax.random.PRNGKey(0)))  # compile
    t0 = time.perf_counter()
    for i in range(max(args.frames // 2, 10)):
        np.asarray(eng.frame(cam_arrays(0.3 + 0.01 * i),
                             jax.random.PRNGKey(i)))
    engine_fps = max(args.frames // 2, 10) / (time.perf_counter() - t0)

    # ---- served rate over HTTP (raw transfer, seq-chained like the page) --
    httpd = make_server(eng, port=0)
    port = httpd.server_address[1]
    st = threading.Thread(target=httpd.serve_forever, daemon=True)
    st.start()
    base = f"http://127.0.0.1:{port}/frame"
    seq = 0
    # warm the render thread + trace
    with urllib.request.urlopen(f"{base}?az=0.5&seq=0&raw=1", timeout=120) as r:
        seq = int(r.headers.get("x-seq", "0"))
        assert len(r.read()) == 1920 * 1080 * 3
    t0 = time.perf_counter()
    got = 0
    for i in range(args.frames):
        az = 0.5 + 0.005 * (i + 1)  # always a new state -> a new frame
        with urllib.request.urlopen(
            f"{base}?az={az}&seq={seq}&raw=1", timeout=120
        ) as r:
            seq = int(r.headers.get("x-seq", str(seq)))
            body = r.read()
        assert len(body) == 1920 * 1080 * 3
        got += 1
    served_fps = got / (time.perf_counter() - t0)
    httpd.shutdown()
    if getattr(httpd, "render_loop", None):
        httpd.render_loop.stop()

    ratio = served_fps / engine_fps
    print(f"engine_fps={engine_fps:.2f}  served_fps={served_fps:.2f}  "
          f"served/engine={ratio:.2f}")
    assert ratio > 0.8, (
        f"served rate {served_fps:.1f} fps fell more than 20% under the "
        f"engine rate {engine_fps:.1f} fps — the pipeline regressed"
    )
    print("OK")


if __name__ == "__main__":
    main()
