"""Interactive host API — the decoupled equivalent of the reference's input
handling + lil-gui layer (/root/reference/index.html:768-871).

The reference mutates a global CONFIG from GUI sliders (L847-861) and spawns
bodies from mouse drags (L822-844). Here, `Simulation` wraps device-resident
state with the same verbs:

  sim.set(G=2.0, fracture_threshold=50)   # live retune — a new SimConfig
                                          # pytree, same compiled step (the
                                          # fields are jit arguments)
  sim.spawn(pos, vel)                     # addBody with FIFO eviction
  sim.spawn_drag(start, end)              # the drag-back slingshot:
                                          # vel = -0.5 * (end - start) (L834)
  sim.step(n)                             # n frames, one dispatch
  sim.reset('galaxy' | 'collision' | ...) # resetScenario (L744)
  sim.render(...)                         # device-side splat frame
  sim.bodies()                            # compacted host view
  sim.save(path) / Simulation.load(path)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nbx import checkpoint, diagnostics, scene, sim as simmod
from nbx.config import ROCK, SimConfig
from nbx.state import SimState, add_body, compact_arrays

SPAWN_VELOCITY_FACTOR = -0.5  # drag-back slingshot (index.html:834)


class Simulation:
    """Host-side handle on a live simulation."""

    def __init__(self, cfg: Optional[SimConfig] = None, scenario: str = "galaxy",
                 key: int = 0, **scenario_kw):
        self.cfg = cfg or SimConfig()
        self.state: SimState = None  # set by reset
        self._key = key
        self.reset(scenario, **scenario_kw)

    # -- config (the GUI layer) -------------------------------------------
    def set(self, **fields) -> "Simulation":
        """Live-retune dynamic parameters (G, dt, softening, spawn_mass,
        fracture_threshold, merge_time, ... — the lil-gui sliders). Static
        fields (capacity, sub_steps) trigger a recompile on next step, same
        as the reference rebuilding state on maxBodies change."""
        self.cfg = self.cfg.replace(**fields)
        return self

    # -- scenario lifecycle -------------------------------------------------
    def reset(self, scenario: str = "galaxy", **kw) -> "Simulation":
        builder = scene.SCENARIOS[scenario]
        if scenario == "galaxy":
            kw.setdefault("G", float(self.cfg.G))
            # fit the reference's 1 + 150 bodies into smaller capacities
            kw.setdefault("n_disk", min(150, self.cfg.capacity - 1))
        sc = builder(**kw)
        self.state = scene.make_state(self.cfg, sc, key=self._key)
        return self

    # -- stepping -----------------------------------------------------------
    def step(self, n_frames: int = 1):
        """Advance n frames. Returns the stacked event log."""
        if n_frames == 1:
            self.state, events = simmod.step(self.state, self.cfg)
        else:
            self.state, events = simmod.run(self.state, self.cfg, n_frames)
        return events

    # -- interaction ----------------------------------------------------------
    def spawn(self, pos, vel, mass: float | None = None, mat: int = ROCK,
              temp: float = 0.0) -> bool:
        """addBody (index.html:239-245, 835). Returns True if a body was
        FIFO-evicted to make room."""
        m = self.cfg.spawn_mass if mass is None else mass
        self.state, evicted = add_body(
            self.state, jnp.asarray(m, jnp.float32), jnp.asarray(pos, jnp.float32),
            jnp.asarray(vel, jnp.float32), mat, temp,
        )
        return bool(evicted)

    def spawn_drag(self, start, end, mass: float | None = None,
                   mat: int = ROCK) -> bool:
        """The mouse-drag slingshot: spawn at `start` with velocity
        -0.5 * (end - start) (index.html:822-844)."""
        start = np.asarray(start, np.float32)
        end = np.asarray(end, np.float32)
        vel = SPAWN_VELOCITY_FACTOR * (end - start)
        return self.spawn(start, vel, mass=mass, mat=mat)

    def spawn_drag_screen(self, cam, sx0, sy0, sx1, sy1,
                          width: int = 640, height: int = 360,
                          mass: float | None = None,
                          mat: int = ROCK) -> tuple[bool, bool]:
        """Full reference input path: raycast two screen points onto the
        y = 0 plane (index.html:787-790) then slingshot-spawn between them.

        Returns (spawned, evicted): spawned is False when either ray misses
        the plane (no-op); evicted is True when the spawn FIFO-evicted the
        oldest body to make room."""
        from nbx.render.splat import screen_to_plane

        p0, hit0 = screen_to_plane(cam, sx0, sy0, width, height)
        p1, hit1 = screen_to_plane(cam, sx1, sy1, width, height)
        if not (bool(hit0) and bool(hit1)):
            return False, False
        evicted = self.spawn_drag(
            np.asarray(p0), np.asarray(p1), mass=mass, mat=mat
        )
        return True, evicted

    # -- observation -----------------------------------------------------------
    def bodies(self) -> dict:
        """Compacted host view in insertion order (the reference's
        physics.bodies array)."""
        return compact_arrays(self.state)

    @property
    def n_alive(self) -> int:
        return int(self.state.n_alive)

    def measure(self) -> "diagnostics.Diagnostics":
        return jax.tree.map(np.asarray, diagnostics.measure(self.state, self.cfg))

    def render(self, cam=None, width: int = 640, height: int = 360,
               exposure: float = 1.5) -> np.ndarray:
        from nbx.render import splat

        img = splat.render_state(
            self.state, self.cfg, cam, width=width, height=height,
            exposure=exposure,
        )
        return np.asarray(img)

    # -- persistence -----------------------------------------------------------
    def run_checkpointed(
        self, n_frames: int, path: str, every: int = 100
    ) -> None:
        """Advance n_frames, snapshotting every `every` frames — the
        preemption-recovery loop (SURVEY.md section 5, failure detection /
        elastic recovery): a killed job resumes from the last snapshot with
        Simulation.load(path) and loses at most `every` frames."""
        done = 0
        while done < n_frames:
            chunk = min(every, n_frames - done)
            self.step(chunk)
            done += chunk
            tmp = path + ".tmp.npz"  # np.savez appends .npz to bare names
            checkpoint.save_state(tmp, self.state, self.cfg)
            import os

            os.replace(tmp, path)  # atomic: never a torn checkpoint

    def save(self, path: str) -> None:
        checkpoint.save_state(path, self.state, self.cfg)

    @classmethod
    def load(cls, path: str) -> "Simulation":
        state, cfg = checkpoint.load_state(path)
        obj = cls.__new__(cls)
        # Fallback config must match the saved state's shape: a state from a
        # collisions-disabled run has contact=None, and stepping it under
        # the default collisions=True would crash (ADVICE round-1).
        obj.cfg = cfg or SimConfig(
            capacity=state.capacity, collisions=state.contact is not None
        )
        obj.state = state
        obj._key = 0
        return obj
