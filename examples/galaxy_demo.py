"""Galaxy demo: the reference startup scene with full physics + the composite
render pipeline, producing PNG frames and a self-contained HTML player.

    python examples/galaxy_demo.py [n_frames] [out_dir]

Reproduces the reference's opening experience (index.html:766 startup with
resetScenario('galaxy') into the rAF loop) headlessly: hot metal core,
150-body disk, live merges/bounces, trails, particles, flashes, bloom.
"""

import os
import sys

import numpy as np

from nbx import scene, sim
from nbx.config import SimConfig
from nbx.render import viewer
from nbx.render.pipeline import FrameState, render_and_advance
from nbx.render.splat import Camera


def main(n_frames: int = 240, out_dir: str = "/tmp/nbx_galaxy"):
    cfg = SimConfig()
    st = scene.make_state(cfg, scene.reference_galaxy(seed=0), key=0)
    fr = FrameState.create(cfg.capacity, cfg.trail_length)
    cam = Camera.default()
    os.makedirs(out_dir, exist_ok=True)

    frames, traj, temps = [], [], []
    for k in range(n_frames):
        st, ev = sim.step(st, cfg)
        fr, img = render_and_advance(fr, st, cfg, ev, cam, width=640, height=360)
        if k % 4 == 0:
            frames.append(np.asarray(img))
        traj.append(np.asarray(st.pos))
        temps.append(np.asarray(st.temp))

    paths = viewer.write_frames(out_dir, np.stack(frames))
    tj = os.path.join(out_dir, "trajectory.json")
    viewer.record_trajectory(
        tj, np.stack(traj), np.asarray(st.radius(cfg)), np.stack(temps),
        np.asarray(st.mat), stride=2,
    )
    viewer.write_html_player(os.path.join(out_dir, "player.html"), tj)
    print(f"{len(paths)} frames + player.html -> {out_dir}")
    print(f"final bodies alive: {int(st.n_alive)}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nbx_galaxy"
    main(n, out)
