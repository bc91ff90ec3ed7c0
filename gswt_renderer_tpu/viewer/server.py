"""Interactive browser viewer: MJPEG-ish PNG streaming + key capture.

The reference renders into a browser canvas with an egui overlay (gui.rs);
the TPU build serves frames over HTTP instead: a small single-page app polls
/frame.png and posts keydown/keyup events (the same WASD/R/F move + IJKL
look + Space sprint bindings, control.rs:90-127). A JSON /hud endpoint
exposes the perf HUD counters (FPS, sort/build times, trigger rates, splat
counts — the reference's Render/Perf windows, gui.rs:414-881).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .headless import write_png

_PAGE = """<!DOCTYPE html>
<html><head><title>gswt_renderer_tpu</title><style>
body { margin:0; background:#111; color:#ddd; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px; }
img { display:block; margin:auto; }
</style></head>
<body>
<div id="hud"></div>
<img id="frame" width="WIDTH" height="HEIGHT"/>
<script>
const img = document.getElementById('frame');
function tick() {
  img.src = '/frame.png?' + Date.now();
}
img.onload = () => setTimeout(tick, 30);
img.onerror = () => setTimeout(tick, 300);
tick();
setInterval(async () => {
  const r = await fetch('/hud'); const h = await r.json();
  document.getElementById('hud').innerText =
    `fps ${h.fps.toFixed(1)}  frame ${h.frame_ms.toFixed(1)}ms  ` +
    `sort ${h.sort_ms.toFixed(1)}ms (${(100*h.sort_trigger).toFixed(0)}%)  ` +
    `build ${h.build_ms.toFixed(1)}ms  splats ${h.splats}`;
}, 500);
for (const ev of ['keydown','keyup']) {
  window.addEventListener(ev, e => {
    fetch('/key', {method:'POST', body: JSON.stringify(
      {key: e.key, pressed: ev === 'keydown'})});
    e.preventDefault();
  });
}
</script></body></html>"""


def serve(engine, host="0.0.0.0", port=8080):
    """Run the render loop + HTTP server until interrupted."""
    state = {"png": b"", "lock": threading.Lock()}

    def render_loop():
        while True:
            img = engine.frame(readback=True)
            if img is None:
                continue
            buf = io.BytesIO()

            class _W:
                def __init__(self, b):
                    self.b = b

                def write(self, d):
                    self.b.write(d)

            # reuse write_png via a temp path-free encoder
            import struct
            import zlib

            arr = np.clip(img[..., :3] * 255.0, 0, 255).astype(np.uint8)
            h, w = arr.shape[:2]
            raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

            def chunk(tag, data):
                c = tag + data
                return struct.pack(">I", len(data)) + c + struct.pack(
                    ">I", zlib.crc32(c)
                )

            png = (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw, 1))
                + chunk(b"IEND", b"")
            )
            with state["lock"]:
                state["png"] = png

    t = threading.Thread(target=render_loop, daemon=True)
    t.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                with state["lock"]:
                    png = state["png"]
                self.send_response(200 if png else 503)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            elif self.path.startswith("/hud"):
                f_avg, _ = engine.frame_time_ma.calc()
                s_avg, _ = engine.sort_time_ma.calc()
                b_avg, _ = engine.build_time_ma.calc()
                hud = dict(
                    fps=1000.0 / f_avg if f_avg > 0 else 0.0,
                    frame_ms=f_avg,
                    sort_ms=s_avg,
                    build_ms=b_avg,
                    sort_trigger=engine.sort_trigger_ma.calc()[0],
                    splats=(
                        engine.cur_scene.splat_count if engine.cur_scene else 0
                    ),
                )
                body = json.dumps(hud).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                w, h = engine.camera.viewport
                body = _PAGE.replace("WIDTH", str(w)).replace(
                    "HEIGHT", str(h)
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)

        def do_POST(self):
            if self.path.startswith("/key"):
                n = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(n))
                engine.handle_key(str(data.get("key", "")), bool(data["pressed"]))
            elif self.path.startswith("/config"):
                # live render-config tweaks (the reference's Render window,
                # gui.rs:414-781): POST {"splat_scale": 1.5, "draw_mode": 1,
                # "use_clip": true, ...} with RenderConfig field names; also
                # "freeze_frame"/"step_frame"/"lock_tile"/"lock_sort".
                n = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(n))
                from ..core.config import DrawMode

                for k, v in data.items():
                    if k in ("freeze_frame", "step_frame", "lock_tile",
                             "lock_sort", "use_skybox", "use_proxy",
                             "render_gs"):
                        setattr(engine, k, bool(v))
                    elif hasattr(engine.render_config, k):
                        if k == "draw_mode":
                            v = DrawMode(int(v))
                        elif isinstance(v, list):
                            v = tuple(v)
                        setattr(engine.render_config, k, v)
            self.send_response(204)
            self.end_headers()

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"viewer at http://{host}:{port}/")
    server.serve_forever()
