"""Interactive browser viewer: mouse-orbit the TPU engine over HTTP.

The reference is a browser WebGPU app with an OrbitCameraController bound to
canvas mouse events (src/main.ts:110-193, src/OrbitCameraController.ts:35-70).
Our engine is headless; this serves the same interaction loop over HTTP: a
single-page client maps drag/wheel gestures to orbit parameters (same speeds
as the reference) and streams freshly rendered frames.

PIPELINED, not serial (round-3 redesign): a dedicated render thread
continuously renders the LATEST requested camera state into a double buffer,
while HTTP handler threads (ThreadingHTTPServer) encode and ship the newest
completed frame — render of frame i+1 overlaps encode+transfer of frame i,
so the served rate tracks the engine rate instead of the render+encode+ship
sum.  Stale camera states are dropped (latest-wins), matching how a rAF
browser loop coalesces input events.

Transfer encodings: PNG (default, works in any <img>) or raw RGB
(?raw=1, rendered via canvas putImageData — no encode on the hot path; the
client picks raw automatically).  The HUD shows live server render ms,
encode ms, client-measured FPS, and a one-off device per-stage profile
(Engine.stage_profile: fused-delta project/bin/blend ms).

Stdlib-only (http.server).

Usage:
    from splat_renderer_tpu.viewer.serve import serve
    serve(engine, port=8000)      # then open http://localhost:8000
"""

from __future__ import annotations

import io
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import jax
import numpy as np

from ..camera import Camera
from ..render.pipeline import Engine
from ..utils.image import to_uint8_rows, unflatten_rows

_PAGE = """<!doctype html>
<html><head><title>splat_renderer_tpu</title><style>
body { margin:0; background:#0d0d1a; overflow:hidden; }
canvas { width:100vw; height:100vh; object-fit:contain; display:block; cursor:grab; }
#hud { position:fixed; top:8px; left:8px; color:#8fa; font:12px monospace;
       white-space:pre; }
</style></head><body>
<canvas id="v" width="__W__" height="__H__"></canvas><div id="hud"></div>
<script>
let az = 0.5, el = 0.5, dist = 3.0, px = 0, py = 0, half = 0;
let t0 = performance.now(), seq = 0, frames = 0, fpsT = performance.now(), fps = 0;
const animate = __ANIMATE__;
const cv = document.getElementById('v'), hud = document.getElementById('hud');
const ctx = cv.getContext('2d');
const W = cv.width, H = cv.height;
const off = document.createElement('canvas'), offctx = off.getContext('2d');
// 'h' toggles half-res serving: the frame is 2x2-pooled ON DEVICE, so the
// wire carries 4x fewer bytes — the knob for remote/tunneled links
window.onkeydown = e => { if (e.key === 'h') { half = 1 - half; dirty = true; } };
const clamp = (x, a, b) => Math.max(a, Math.min(b, x));
let drag = null, panning = false, dirty = true;
// left drag rotates; middle/right drag pans (src/OrbitCameraController.ts:41-53)
cv.onmousedown = e => {
  drag = [e.clientX, e.clientY]; panning = e.button !== 0; e.preventDefault();
};
cv.oncontextmenu = e => e.preventDefault();
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
async function loop() {
  // keep exactly one fetch inflight; the server's render thread already
  // pipelines the NEXT frame while this one encodes/ships
  while (true) {
    if (!dirty && !animate) { await new Promise(r => setTimeout(r, 8)); continue; }
    dirty = false;
    const t = (performance.now() - t0) / 1000;
    const r = await fetch(`/frame?az=${az}&el=${el}&d=${dist}&px=${px}&py=${py}&t=${t}&seq=${seq}&raw=1&half=${half}`);
    seq = parseInt(r.headers.get('x-seq') || '0');
    const ms = r.headers.get('x-render-ms'), stages = r.headers.get('x-stage-ms') || '';
    const fw = parseInt(r.headers.get('x-w') || W), fh = parseInt(r.headers.get('x-h') || H);
    const buf = new Uint8Array(await r.arrayBuffer());
    const id = offctx.createImageData(fw, fh);
    for (let i = 0, j = 0; i < buf.length; i += 3, j += 4) {
      id.data[j] = buf[i]; id.data[j+1] = buf[i+1]; id.data[j+2] = buf[i+2]; id.data[j+3] = 255;
    }
    off.width = fw; off.height = fh;
    offctx.putImageData(id, 0, 0);
    if (fw === W && fh === H) { ctx.drawImage(off, 0, 0); }
    else { ctx.imageSmoothingEnabled = true; ctx.drawImage(off, 0, 0, W, H); }
    frames++;
    const now = performance.now();
    if (now - fpsT > 500) { fps = frames * 1000 / (now - fpsT); frames = 0; fpsT = now; }
    hud.textContent = `served ${fps.toFixed(1)} fps  render ${ms} ms\\n${stages}\\naz=${az.toFixed(2)} el=${el.toFixed(2)} d=${dist.toFixed(2)} pan=(${px.toFixed(2)},${py.toFixed(2)})`;
  }
}
loop();
</script></body></html>"""


class _RenderLoop:
    """Latest-wins render thread: double-buffers engine frames.

    `request(state)` stores the newest desired camera state; the thread
    renders whenever the desired state differs from the last rendered one
    and publishes (seq, rgb_u8, render_ms).  `latest(min_seq, timeout)`
    blocks until a frame newer than min_seq exists — handler threads encode
    and ship it while the loop is already rendering the next.
    """

    def __init__(self, engine: Engine,
                 animate: Optional[Callable[[float], None]] = None,
                 profile_stages: bool = True):
        self.engine = engine
        self.animate = animate
        self.profile_stages = profile_stages
        self.half = False  # serve 2x2-pooled half-res frames (remote links)
        self._cv = threading.Condition()
        self._desired = None
        self._rendered_state = None
        self._dev_frame = None  # (seq, device u8 (H, W*3), width, ms)
        self._frame = None  # (seq, np.uint8 (H, W, 3), render_ms)
        self._seq = 0
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        # dedicated transfer thread: fetches the NEWEST device frame to
        # host while the render thread produces the next one — the serve
        # cycle becomes max(render, fetch) instead of their sum (the
        # fetch, ~90-750 ms for 6 MB over the relay, dominates; round 5)
        self._xthread = threading.Thread(target=self._xfer, daemon=True)
        self._to_u8 = None  # jitted device-side u8 conversion (lazy)
        self.stage_ms = {}  # one-off device stage profile (filled lazily)

    def start(self):
        self._thread.start()
        self._xthread.start()
        return self

    def stop(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)
        self._xthread.join(timeout=5)

    def request(self, state: tuple):
        with self._cv:
            self._desired = state
            self._cv.notify_all()

    def latest(self, min_seq: int, state: tuple, timeout: float = 30.0):
        """Newest frame strictly after min_seq — or the current frame if
        `state` is already the rendered one (idempotent refetch)."""
        deadline = time.monotonic() + timeout
        with self._cv:
            while not (
                self._frame is not None
                and (self._frame[0] > min_seq
                     or (self._rendered_state == state
                         and self._frame[0] == self._seq))
            ):
                rem = deadline - time.monotonic()
                if rem <= 0 or self._stop:
                    return self._frame  # best effort (may be None)
                self._cv.wait(rem)
            return self._frame

    def _camera_arrays(self, state):
        az, el, dist, px, py, t = state[:6]
        cam = Camera(aspect=self.engine.rcfg.width / self.engine.rcfg.height)
        cam.azimuth = az
        cam.elevation = float(np.clip(el, -cam.MAX_ELEVATION,
                                      cam.MAX_ELEVATION))
        cam.distance = float(np.clip(dist, cam.MIN_DISTANCE,
                                     cam.MAX_DISTANCE))
        cam.target = np.zeros(3, np.float32)
        if px or py:
            cam.pan(px, py)
        import jax.numpy as jnp

        return {k: jnp.asarray(v) for k, v in cam.arrays(t).items()}

    def _run(self):
        while True:
            with self._cv:
                while not self._stop and (
                    self._desired is None
                    or self._desired == self._rendered_state
                ):
                    self._cv.wait()
                if self._stop:
                    return
                state = self._desired
            t = state[-1]
            if self.animate is not None:
                self.animate(t)
            camera = self._camera_arrays(state)
            seq = self._seq + 1
            t0 = time.perf_counter()
            img = self.engine.frame(camera, jax.random.PRNGKey(seq))
            # quantize ON DEVICE and fetch u8 flat rows: 4x less transfer
            # than np.asarray on the f32 image — the fetch, not the
            # render, bounds the served rate over the relay (round 5).
            # half mode 2x2-average-pools on device first (another 4x off
            # the wire — the knob for tunneled links; toggle 'h' in the
            # browser page or pass half=1 on /frame)
            half = bool(state[6]) if len(state) > 6 else self.half
            if self._to_u8 is None:
                fullfn = jax.jit(to_uint8_rows)

                def halffn(x):
                    # crop to even dims first: odd H/W would give the
                    # four phase slices mismatched shapes and kill the
                    # render thread at trace time (every later request
                    # would 503)
                    he, we = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
                    x = x[:he, :we]
                    p = 0.25 * (x[0::2, 0::2] + x[1::2, 0::2]
                                + x[0::2, 1::2] + x[1::2, 1::2])
                    return to_uint8_rows(p)

                self._to_u8 = {False: fullfn, True: jax.jit(halffn)}
            w = self.engine.rcfg.width // (2 if half else 1)
            # publish the DEVICE u8 array; the transfer thread fetches it
            # while this thread renders the next frame (see _xfer)
            arr_dev = self._to_u8[half](img)
            ms = (time.perf_counter() - t0) * 1e3
            # publish BEFORE the one-off stage profile: stage_profile jits
            # P1/P2/P3 over the relay (tens of seconds cold), and holding
            # the FIRST frame back behind it made latest() time out and the
            # handler 503 — exactly how BENCH_r04's viewer step died
            # (ADVICE r4 medium; the bench step additionally retries 503s)
            with self._cv:
                self._seq = seq
                self._dev_frame = (seq, arr_dev, w, ms)
                self._rendered_state = state
                self._cv.notify_all()
            if self.profile_stages and not self.stage_ms:
                try:  # one-off fused-delta device profile for the HUD
                    self.stage_ms = self.engine.stage_profile(
                        camera, jax.random.PRNGKey(0)) or {"n/a": 0.0}
                except Exception:
                    self.stage_ms = {"n/a": 0.0}

    def _xfer(self):
        """Transfer thread: device->host fetch of the newest rendered
        frame, pipelined against the render thread.  Stale device frames
        are skipped (latest-wins at the transfer stage too)."""
        last = 0
        while True:
            with self._cv:
                while not self._stop and (
                    self._dev_frame is None or self._dev_frame[0] <= last
                ):
                    self._cv.wait()
                if self._stop:
                    return
                seq, arr_dev, w, ms = self._dev_frame
            arr = unflatten_rows(np.asarray(arr_dev), w)  # outside the lock
            last = seq
            with self._cv:
                # keep only the newest host frame (a newer transfer can't
                # overtake us — this is the only writer of _frame)
                self._frame = (seq, arr, ms)
                self._cv.notify_all()


def make_server(
    engine: Engine,
    port: int = 8000,
    animate: Optional[Callable[[float], None]] = None,
    host: str = "127.0.0.1",
    profile_stages: bool = True,
) -> ThreadingHTTPServer:
    """Build the viewer HTTP server without starting it.

    port=0 binds an ephemeral port (read it from `.server_address[1]`) —
    the test surface; `serve` is the blocking entry point.  The attached
    render loop starts with the server thread's first /frame request and is
    stopped by `server.render_loop.stop()` (serve does both).

    profile_stages=False skips the one-off HUD stage profile entirely —
    the bench's served-FPS measurement uses it so the profile's P1/P2/P3
    compiles never contend with the frames being timed.
    """
    loop = _RenderLoop(engine, animate, profile_stages).start()
    page = (_PAGE
            .replace("__W__", str(engine.rcfg.width))
            .replace("__H__", str(engine.rcfg.height))
            .replace("__ANIMATE__", "true" if animate else "false"))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = page.encode()
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

            def f(name, default):
                return float(q.get(name, [default])[0])

            state = (f("az", 0.5), f("el", 0.5), f("d", 3.0),
                     f("px", 0.0), f("py", 0.0), f("t", 0.0),
                     q.get("half", ["0"])[0] == "1")
            min_seq = int(f("seq", 0))
            raw = q.get("raw", ["0"])[0] == "1"
            loop.request(state)
            got = loop.latest(min_seq, state)
            if got is None:
                self.send_response(503)
                self.end_headers()
                return
            seq, arr, ms = got
            t1 = time.perf_counter()
            if raw:
                body = arr.tobytes()
                ctype = "application/octet-stream"
            else:
                buf = io.BytesIO()
                _write_png_bytes(buf, arr)
                body = buf.getvalue()
                ctype = "image/png"
            encode_ms = (time.perf_counter() - t1) * 1e3
            stages = " ".join(f"{k}={v}" for k, v in loop.stage_ms.items())
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Seq", str(seq))
            # actual served frame geometry (half mode pools 2x2 on device)
            self.send_header("X-W", str(arr.shape[1]))
            self.send_header("X-H", str(arr.shape[0]))
            self.send_header("X-Render-Ms", f"{ms:.1f}")
            self.send_header(
                "X-Stage-Ms",
                f"encode={encode_ms:.1f} | device stages: {stages}",
            )
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer((host, port), Handler)
    server.render_loop = loop  # expose for tests/shutdown
    return server


def serve(
    engine: Engine,
    port: int = 8000,
    animate: Optional[Callable[[float], None]] = None,
    host: str = "127.0.0.1",
) -> None:
    """Serve the interactive viewer (blocking)."""
    httpd = make_server(engine, port, animate, host)
    print(f"splat_renderer_tpu viewer: http://{host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    finally:
        httpd.render_loop.stop()


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
