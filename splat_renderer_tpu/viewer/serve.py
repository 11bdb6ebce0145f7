"""Interactive browser viewer: mouse-orbit the TPU engine over HTTP.

The reference is a browser WebGPU app with an OrbitCameraController bound to
canvas mouse events (src/main.ts, src/OrbitCameraController.ts:35-70).  Our
engine is headless; this serves the same interaction loop over HTTP: a
single-page client maps drag/wheel gestures to orbit parameters (same speeds
as the reference) and fetches freshly rendered PNG frames.

Stdlib-only (http.server); frames render on demand in ~tens of ms, so the
loop is interactive on one chip.

Usage:
    from splat_renderer_tpu.viewer.serve import serve
    serve(engine, port=8000)      # then open http://localhost:8000
"""

from __future__ import annotations

import io
import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import jax
import numpy as np

from ..camera import Camera
from ..render.pipeline import Engine
from ..utils.image import to_uint8, write_png

_PAGE = """<!doctype html>
<html><head><title>splat_renderer_tpu</title><style>
body { margin:0; background:#0d0d1a; overflow:hidden; }
img { width:100vw; height:100vh; object-fit:contain; display:block; cursor:grab; }
#hud { position:fixed; top:8px; left:8px; color:#8fa; font:12px monospace;
       white-space:pre; }
</style></head><body>
<img id="v" draggable="false"><div id="hud"></div>
<script>
let az = 0.5, el = 0.5, dist = 3.0, px = 0, py = 0;
let t0 = performance.now(), inflight = false, dirty = true;
const img = document.getElementById('v'), hud = document.getElementById('hud');
const clamp = (x, a, b) => Math.max(a, Math.min(b, x));
let drag = null, panning = false;
// left drag rotates; middle/right drag pans (src/OrbitCameraController.ts:41-53)
img.onmousedown = e => {
  drag = [e.clientX, e.clientY]; panning = e.button !== 0; e.preventDefault();
};
img.oncontextmenu = e => e.preventDefault();
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (panning) {                                 // PAN_SPEED
    px -= dx * 0.002; py += dy * 0.002;
  } else {                                       // ROTATE_SPEED
    az -= dx * 0.005;
    el = clamp(el + dy * 0.005, -1.56, 1.56);
  }
  drag = [e.clientX, e.clientY]; dirty = true;
};
window.onwheel = e => { dist = clamp(dist + e.deltaY * 0.001 * dist, 0.5, 20); dirty = true; };
let prevUrl = null;
async function loop() {
  if (dirty && !inflight) {
    dirty = false; inflight = true;
    const t = (performance.now() - t0) / 1000;
    const r = await fetch(`/frame?az=${az}&el=${el}&d=${dist}&px=${px}&py=${py}&t=${t}`);
    const ms = r.headers.get('x-render-ms');
    const stages = r.headers.get('x-stage-ms') || '';
    const url = URL.createObjectURL(await r.blob());
    img.onload = () => { if (prevUrl) URL.revokeObjectURL(prevUrl); prevUrl = url; };
    img.src = url;
    hud.textContent = `render ${ms} ms  ${stages}\\naz=${az.toFixed(2)} el=${el.toFixed(2)} d=${dist.toFixed(2)} pan=(${px.toFixed(2)},${py.toFixed(2)})`;
    inflight = false;
  }
  requestAnimationFrame(loop);
}
loop(); dirty = true;
</script></body></html>"""


def make_server(
    engine: Engine,
    port: int = 8000,
    animate: Optional[Callable[[float], None]] = None,
    host: str = "127.0.0.1",
) -> ThreadingHTTPServer:
    """Build the viewer HTTP server without starting it.

    port=0 binds an ephemeral port (read it from `.server_address[1]`) —
    the test surface; `serve` is the blocking entry point.
    """
    cam = Camera(aspect=engine.rcfg.width / engine.rcfg.height)
    lock = threading.Lock()
    frame_counter = [0]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path != "/frame":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(url.query)
            with lock:
                cam.azimuth = float(q.get("az", [0.5])[0])
                cam.elevation = float(
                    np.clip(float(q.get("el", [0.5])[0]), -cam.MAX_ELEVATION,
                            cam.MAX_ELEVATION)
                )
                cam.distance = float(
                    np.clip(float(q.get("d", [3.0])[0]), cam.MIN_DISTANCE,
                            cam.MAX_DISTANCE)
                )
                # pan: client accumulates camera-plane offsets (the
                # reference's middle/right-drag, src/OrbitCameraController.ts:50-53)
                cam.target = np.zeros(3, np.float32)
                pan_x = float(q.get("px", [0.0])[0])
                pan_y = float(q.get("py", [0.0])[0])
                if pan_x or pan_y:
                    cam.pan(pan_x, pan_y)
                t = float(q.get("t", [0.0])[0])
                if animate is not None:
                    animate(t)
                import jax.numpy as jnp

                camera = {k: jnp.asarray(v) for k, v in cam.arrays(t).items()}
                t0 = time.perf_counter()
                frame_counter[0] += 1
                img = engine.frame(camera, jax.random.PRNGKey(frame_counter[0]))
                arr = to_uint8(np.asarray(img))
                ms = (time.perf_counter() - t0) * 1e3
            buf = io.BytesIO()
            t1 = time.perf_counter()
            _write_png_bytes(buf, arr)
            encode_ms = (time.perf_counter() - t1) * 1e3
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Render-Ms", f"{ms:.1f}")
            self.send_header(
                "X-Stage-Ms", f"device={ms:.1f} png={encode_ms:.1f}"
            )
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    engine: Engine,
    port: int = 8000,
    animate: Optional[Callable[[float], None]] = None,
    host: str = "127.0.0.1",
) -> None:
    """Serve the interactive viewer (blocking)."""
    httpd = make_server(engine, port, animate, host)
    print(f"splat_renderer_tpu viewer: http://{host}:{httpd.server_address[1]}")
    httpd.serve_forever()


def _write_png_bytes(buf: io.BytesIO, arr: np.ndarray) -> None:
    import struct
    import zlib

    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf.write(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 1))
        + chunk(b"IEND", b"")
    )
