"""Randomized parity fuzzing: nbx vs the sequential oracle on small random
scenes with collisions enabled (bounce + merge; fracture disabled — its RNG
streams differ by construction).

The Jacobi impulse application diverges from the sequential sweep only for
contact CLUSTERS (3+ mutually-overlapping bodies, SURVEY.md section 7);
random sparse scenes exercise the common paths: simultaneous independent
pairs, merge-vs-bounce branch selection, heating, timers, eviction.
"""

import numpy as np
import pytest

import oracle as orc
from nbx import scene as scene_mod
from nbx import sim
from nbx.config import SimConfig
from nbx.state import compact_arrays


def _random_scene(seed, n=6, spread=12.0):
    rng = np.random.default_rng(seed)
    return dict(
        pos=rng.uniform(-spread, spread, (n, 3)).astype(np.float32),
        vel=rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32),
        mass=rng.uniform(5.0, 30.0, n).astype(np.float32),
        mat=rng.integers(0, 3, n).astype(np.int32),
        temp=np.zeros(n, np.float32),
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_parity_bounce_merge(seed):
    sc = _random_scene(seed)
    cfg = SimConfig(
        capacity=16,
        fracture_threshold=1e9,  # no fracture RNG
        merge_time=0.08,
    )
    st = scene_mod.make_state(cfg, sc, key=seed)
    sys = orc.from_scene(
        sc,
        G=cfg.G,
        softening=cfg.softening,
        max_bodies=cfg.capacity,
        fracture_threshold=cfg.fracture_threshold,
        merge_time=cfg.merge_time,
    )
    h = cfg.dt / cfg.sub_steps
    n_frames = 60
    for _ in range(n_frames):
        st, _ = sim.step(st, cfg)
    for _ in range(n_frames * cfg.sub_steps):
        sys.integrate(h)

    got = compact_arrays(st)
    # same survivor count and total mass (merges agree)
    assert len(sys.bodies) == int(st.n_alive), (
        f"seed {seed}: oracle {len(sys.bodies)} vs nbx {int(st.n_alive)} bodies"
    )
    np.testing.assert_allclose(
        got["mass"].sum(), sys.mass_array().sum(), rtol=1e-5
    )
    # trajectories track within Jacobi-vs-sequential tolerance
    np.testing.assert_allclose(got["pos"], sys.pos_array(), atol=0.15)
    np.testing.assert_allclose(got["vel"], sys.vel_array(), atol=0.15)
    # conservation regardless of oracle agreement
    p_nbx = (got["mass"][:, None] * got["vel"]).sum(0)
    assert np.isfinite(p_nbx).all()
