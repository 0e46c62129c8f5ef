"""Live progressive viewer: browser canvas fed by a local HTTP server.

The TPU-world equivalent of the reference's two interactive frontends:

- the native minifb window with its render-thread/GUI-thread split
  (reference: raytracer/src/main.rs:179-253) becomes a render thread
  plus an HTTP thread sharing the latest tonemapped frame under a lock;
- the WASM/browser canvas driven by requestAnimationFrame
  (reference: raytracer_wasm/src/lib.rs:28-55, www/index.html:10-23)
  becomes a canvas page polling /frame.png.

Keyboard camera controls mirror main.rs:107-169: arrows + comma/period
move, WASD rotates; every move clears the film.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

INDEX_HTML = """<!doctype html>
<html><head><title>raytracer_tpu</title></head>
<body style="background:#222;color:#ddd;font-family:monospace">
<div id="stats"></div>
<img id="view" style="image-rendering:pixelated"/>
<div>keys: arrows/comma/period move &middot; WASD rotate</div>
<script>
const img = document.getElementById('view');
const stats = document.getElementById('stats');
function tick() {
  img.src = '/frame.png?' + Date.now();
  fetch('/stats').then(r => r.json()).then(s => {
    stats.textContent = `frame ${s.frames}  ${s.fps.toFixed(1)} fps  ` +
                        `${(s.rays_per_sec/1e6).toFixed(2)} Mrays/s`;
  });
}
img.onload = () => requestAnimationFrame(tick);
img.onerror = () => setTimeout(tick, 250);
document.addEventListener('keydown', e => fetch('/key/' + e.key));
tick();
</script></body></html>"""

# key -> (method, args); mirrors handle_events (main.rs:123-163)
_KEYMAP = {
    "ArrowLeft": ("move", (-0.1, 0.0, 0.0)),
    "ArrowRight": ("move", (0.1, 0.0, 0.0)),
    "ArrowUp": ("move", (0.0, 0.1, 0.0)),
    "ArrowDown": ("move", (0.0, -0.1, 0.0)),
    ",": ("move", (0.0, 0.0, 0.1)),
    ".": ("move", (0.0, 0.0, -0.1)),
    "w": ("rot", (0.1, 0.0)),
    "s": ("rot", (-0.1, 0.0)),
    "a": ("rot", (0.0, 0.1)),
    "d": ("rot", (0.0, -0.1)),
}


def serve(rt, port: int = 8000, frame_iterations: int = 0):
    """Run the render loop in a thread and serve frames until Ctrl-C."""
    from raytracer_tpu.utils.stats import Stats

    state = {"frames": 0, "fps": 0.0, "rays_per_sec": 0.0, "png": b""}
    lock = threading.Lock()
    stop = threading.Event()
    events = []  # pending camera events (mpsc-channel analogue, main.rs:180)

    def encode(img) -> bytes:
        from PIL import Image
        bio = io.BytesIO()
        Image.fromarray(img).save(bio, format="PNG")
        return bio.getvalue()

    def render_loop():
        import time
        stats = Stats()
        while not stop.is_set():
            with lock:
                pending, events[:] = events[:], []
            for kind, args in pending:   # handle_events parity
                if kind == "move":
                    rt.move_camera(*args)
                else:
                    rt.rotate_camera(*args)
            n = rt.trace_frame_additive()
            now = time.perf_counter()
            dt = now - stats.last_iteration
            stats.stats(n)
            png = encode(rt.get_tonemapped_image())
            with lock:
                state["frames"] += 1
                state["fps"] = 1.0 / dt if dt > 0 else 0.0
                state["rays_per_sec"] = n / dt if dt > 0 else 0.0
                state["png"] = png
            if frame_iterations and state["frames"] >= frame_iterations:
                break

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, "text/html", INDEX_HTML.encode())
            elif self.path.startswith("/frame.png"):
                with lock:
                    png = state["png"]
                if png:
                    self._send(200, "image/png", png)
                else:
                    self._send(404, "text/plain", b"no frame yet")
            elif self.path.startswith("/stats"):
                with lock:
                    body = json.dumps({k: state[k] for k in
                                       ("frames", "fps", "rays_per_sec")})
                self._send(200, "application/json", body.encode())
            elif self.path.startswith("/key/"):
                key = self.path[len("/key/"):]
                action = _KEYMAP.get(key)
                if action:
                    with lock:
                        events.append(action)
                self._send(200, "text/plain", b"ok")
            else:
                self._send(404, "text/plain", b"not found")

    thread = threading.Thread(target=render_loop, daemon=True)
    thread.start()
    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"serving live view on http://127.0.0.1:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
        server.server_close()
    return 0
