"""Demo movie: the reference galaxy under full physics with a scripted
camera — an ease-in orbit sweep that dollies in while the disk evolves
(nbx.render.campath driving the full render pipeline).

    python examples/orbit_movie.py [n_frames] [out_dir]

Writes PNG frames; stitch with e.g.
    ffmpeg -r 30 -i frame_%04d.png -pix_fmt yuv420p orbit.mp4
"""

import os
import sys
import time

import jax
import numpy as np

from nbx import scene, sim
from nbx.config import SimConfig
from nbx.render import pipeline as P
from nbx.render import viewer
from nbx.render.campath import orbit_path
from nbx.render.splat import Camera


def main(n_frames: int = 90, out_dir: str = "/tmp/nbx_orbit",
         steps_per_frame: int = 2):
    os.makedirs(out_dir, exist_ok=True)
    cfg = SimConfig()
    st = scene.make_state(cfg, scene.reference_galaxy(seed=0))
    frame = P.FrameState.create(cfg.capacity)
    stars = P.starfield_directions()
    cams = orbit_path(
        Camera.default(), n_frames,
        d_yaw=1.5 * np.pi, d_pitch=-0.25, zoom=0.45, ease=True,
    )
    t0 = time.time()
    for f, cam in enumerate(cams):
        st, evs = sim.run(st, cfg, steps_per_frame)
        # flatten [steps, substeps, ...] -> substep-stacked [S, ...] so
        # EVERY step's merges/flashes render, not just the last one's
        ev1 = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), evs
        )
        frame, img = P.render_and_advance(
            frame, st, cfg, ev1, cam, width=640, height=360, stars=stars,
        )
        viewer.write_png(
            os.path.join(out_dir, f"frame_{f:04d}.png"),
            (np.asarray(img) * 255).astype(np.uint8),
        )
        if f % 30 == 0:
            print(f"frame {f}", flush=True)
    dt = time.time() - t0
    print(f"{n_frames} frames: {dt / n_frames * 1e3:.0f} ms/frame -> {out_dir}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) if x.isdigit() else x for x in a))
