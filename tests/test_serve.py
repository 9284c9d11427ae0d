"""Live viewer server: endpoints drive the simulation over HTTP."""

import json
import threading
import time
import urllib.request

import pytest

from nbx.config import SimConfig
from nbx.serve import LiveSim, make_handler


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    live = LiveSim(
        SimConfig(capacity=32), scenario="collision", width=160, height=90,
        fps=60.0,
    ).start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(live))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    # wait for the first rendered frame
    for _ in range(600):  # first frame includes XLA compile
        if live.frame_png:
            break
        time.sleep(0.1)
    yield base, live
    httpd.shutdown()
    live.stop()


def _get(url, _tries=3):
    # retry transient timeouts: on a 1-core host the dense server's
    # background step loop plus a concurrent suite can starve the HTTP
    # thread past any fixed timeout (measured: one 10 s timeout in an
    # otherwise-green round-5 full-suite run; the same request passes
    # in isolation in <1 s)
    for i in range(_tries):
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                return r.status, r.read(), r.headers.get("Content-Type")
        except TimeoutError:
            if i == _tries - 1:
                raise


def test_index_page(server):
    base, _ = server
    code, body, ctype = _get(base + "/")
    assert code == 200 and ctype == "text/html"
    # every lil-gui control of index.html:847-871 is present in the client
    for control in (
        b"'G','G',0.1,5", b"'dt','dt',0.001,0.05",
        b"'fracture_threshold','fracture',1,100",
        b"'merge_time','mergeTime',0.1,3",
        b"'spawn_mass','spawnMass',1,5000",
        b"'bloom_strength','bloomStr',0,3",
        b"'bloom_threshold','bloomThr',0,1",
        b"Galaxy", b"Collision",  # scenario buttons
        b"drawPreview",  # add-mode green drag preview line (L780-820)
    ):
        assert control in body, control


def test_set_viewer_params(server):
    """bloom sliders hit LiveSim's renderer params, not SimConfig."""
    base, live = server
    _, body, _ = _get(base + "/set?bloom_strength=2.0&bloom_threshold=0.1")
    assert json.loads(body)["set"] == {
        "bloom_strength": 2.0, "bloom_threshold": 0.1,
    }
    assert live.bloom_strength == 2.0 and live.bloom_threshold == 0.1
    s = json.loads(_get(base + "/state")[1])
    assert s["params"]["bloom_strength"] == 2.0
    assert s["params"]["spawn_mass"] == live.sim.cfg.spawn_mass
    _get(base + "/set?bloom_strength=1.2&bloom_threshold=0.3")


def test_frame_png(server):
    base, _ = server
    code, body, ctype = _get(base + "/frame.png")
    assert code == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_state_and_stepping(server):
    base, _ = server
    _, body, _ = _get(base + "/state")
    s0 = json.loads(body)
    assert s0["alive"] == 2
    time.sleep(0.5)
    s1 = json.loads(_get(base + "/state")[1])
    assert s1["step"] > s0["step"]  # background thread is stepping


def test_spawn_endpoint(server):
    base, live = server
    before = json.loads(_get(base + "/state")[1])["alive"]
    code, body, _ = _get(base + "/spawn?sx0=80&sy0=50&sx1=90&sy1=50")
    assert code == 200
    resp = json.loads(body)
    assert resp["spawned"] is True and resp["evicted"] is False
    after = json.loads(_get(base + "/state")[1])["alive"]
    assert after == before + 1


def test_set_and_orbit(server):
    base, live = server
    _get(base + "/set?G=2.5&fracture_threshold=42")
    s = json.loads(_get(base + "/state")[1])
    assert s["G"] == 2.5
    eye0 = live.cam.eye
    _get(base + "/orbit?dyaw=0.5")
    assert float(abs(live.cam.eye - eye0).max()) > 1.0


def test_reset(server):
    base, _ = server
    _get(base + "/reset?scenario=galaxy")
    s = json.loads(_get(base + "/state")[1])
    assert s["alive"] > 2
    _get(base + "/reset?scenario=collision")


def test_cli_parsing():
    """nbx CLI wires args through (serve tested via LiveSim above; here the
    arg plumbing of the other subcommands)."""
    import nbx.__main__ as m

    p = None
    # 'run' end-to-end with tiny settings
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "c.npz")
        rc = m.main([
            "run", "--scenario", "collision", "--frames", "4",
            "--capacity", "8", "--checkpoint", ckpt, "--every", "2",
        ])
        assert rc == 0 and os.path.exists(ckpt)


def test_orbit_pan_endpoint(server):
    import numpy as np

    base, live = server
    tgt0 = np.asarray(live.cam.target)
    _get(base + "/orbit?panx=0.05&pany=0.02")
    assert np.abs(np.asarray(live.cam.target) - tgt0).max() > 0.5


def test_resize_endpoint(server):
    base, live = server
    code, body, _ = _get(base + "/resize?w=320&h=180")
    assert code == 200
    assert json.loads(body) == {"width": 320, "height": 180}
    # next rendered frame comes out at the new size
    for _ in range(600):
        if live.width == 320:
            break
        time.sleep(0.05)
    deadline = time.time() + 60
    while time.time() < deadline:
        import io
        import struct
        buf = live.frame_png
        if len(buf) > 24:
            w, h = struct.unpack(">II", buf[16:24])  # PNG IHDR dims
            if (w, h) == (320, 180):
                break
        time.sleep(0.1)
    else:
        raise AssertionError("frame never re-rendered at the new size")
    # clamped against pathological requests — pause first so the render
    # loop never compiles a 1920-wide frame on the test host (it holds the
    # lock through the compile, which times out the next request)
    live.paused = True
    with live.lock:
        pass  # wait out any in-flight frame
    _get(base + "/resize?w=99999&h=4")
    assert live.width == 1920 and live.height == 36
    _get(base + "/resize?w=160&h=90")
    live.paused = False


def test_stream_pushes_frames(server):
    """The multipart push stream delivers multiple distinct frames with
    correct part framing (no 10 Hz poll quantization)."""
    base, live = server
    req = urllib.request.urlopen(base + "/stream", timeout=15)
    assert "multipart/x-mixed-replace" in req.headers.get("Content-Type")
    data = b""
    deadline = time.time() + 30
    while data.count(b"--nbxframe") < 3 and time.time() < deadline:
        data += req.read(4096)
    req.close()
    parts = data.split(b"--nbxframe")
    pngs = [p for p in parts if b"\x89PNG" in p]
    assert len(pngs) >= 2  # at least two complete pushed frames
    assert b"Content-Type: image/png" in parts[1]


@pytest.fixture(scope="module")
def big_server(server):
    from http.server import ThreadingHTTPServer

    from nbx.serve import BigLiveSim

    # pause the dense module server: on a 1-core host its unthrottled
    # background loop starves the big sim's frame loop and the HTTP
    # requests below past their timeouts (round-4 suite flake); the big
    # tests are defined after every dense test, so nothing observes the
    # dense sim while it is paused
    _, dense = server
    dense.paused = True
    live = BigLiveSim(
        n=512, scenario="cloud", width=128, height=72, fps=60.0,
        force_impl="zero", n_cells=8, band_cells=2, n_trails=32,
    )
    # compile the frame path BEFORE starting the loop: on a 1-core host
    # the module's dense `server` fixture is still stepping in its
    # background thread, and a fixed poll timeout around the ~20 s XLA
    # compile flaked under that contention (round-4 suite)
    live._advance_and_render()
    live.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(live))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    for _ in range(1200):  # warm frames, but the host may be contended
        if live.frame_png or live.error:
            break
        time.sleep(0.1)
    assert live.error is None, live.error
    assert live.frame_png, "no frame within 120s of a compiled loop"
    yield base, live
    httpd.shutdown()
    live.stop()
    dense.paused = False


def test_big_mode_serves_frames_and_steps(big_server):
    """The at-scale granular path behind the same HTTP surface: frames
    render, steps advance, HUD carries the scaled counters."""
    base, live = big_server
    code, body, ctype = _get(base + "/frame.png")
    assert code == 200 and ctype == "image/png" and body[:4] == b"\x89PNG"
    s0 = json.loads(_get(base + "/state")[1])
    assert s0["alive"] > 0 and "n_bounces" in s0
    for _ in range(200):
        s1 = json.loads(_get(base + "/state")[1])
        if s1["step"] > s0["step"]:
            break
        time.sleep(0.1)
    assert s1["step"] > s0["step"], (s0, s1)
    assert s1["error"] is None


def test_big_mode_set_and_spawn(big_server):
    """Sliders retune the scaled cfg live; a drag spawns into a dead slot
    (or reports a counted drop when full — no FIFO eviction at scale)."""
    base, live = big_server
    _get(base + "/set?G=1.25&bloom_strength=0.7")
    assert abs(float(live.cfg.G) - 1.25) < 1e-6
    assert abs(live.bloom_strength - 0.7) < 1e-6
    code, body, _ = _get(base + "/spawn?sx0=60&sy0=30&sx1=70&sy1=40")
    assert code == 200
    out = json.loads(body)
    assert out["spawned"] in (0, 1) and out["evicted"] == 0
    _get(base + "/orbit?dyaw=0.1&zoom=1.1")
    code, _, _ = _get(base + "/reset?scenario=cloud")
    assert code == 200
