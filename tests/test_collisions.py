"""Collision subsystem tests: branch selection, conservation, contact timers
(reference resolveCollisions, index.html:293-443)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbx import sim
from nbx.config import ROCK, SimConfig
from nbx.state import add_body, empty_state


def _two_body_state(cfg, m=(10.0, 10.0), gap_frac=0.9, v=(1.0, -1.0), key=0):
    """Two rock bodies overlapping along x with given approach speeds."""
    st = empty_state(cfg, key)
    from nbx.config import body_radius

    r1 = float(body_radius(jnp.asarray(m[0]), jnp.asarray(ROCK), cfg.materials))
    r2 = float(body_radius(jnp.asarray(m[1]), jnp.asarray(ROCK), cfg.materials))
    d = (r1 + r2) * gap_frac
    st, _ = add_body(st, m[0], jnp.array([0.0, 0, 0]), jnp.array([v[0], 0, 0]), ROCK)
    st, _ = add_body(st, m[1], jnp.array([d, 0.0, 0]), jnp.array([v[1], 0, 0]), ROCK)
    return st


def _run_frames(st, cfg, n):
    for _ in range(n):
        st, ev = sim.step(st, cfg)
    return st, ev


def test_bounce_conserves_momentum():
    cfg = SimConfig(capacity=8, G=0.0, fracture_threshold=1e9, merge_time=1e9)
    st = _two_body_state(cfg, v=(1.0, -1.0))
    p0 = np.asarray(jnp.sum(st.mass[:, None] * st.vel, axis=0))
    st, ev = _run_frames(st, cfg, 5)
    p1 = np.asarray(jnp.sum(st.mass[:, None] * st.vel, axis=0))
    np.testing.assert_allclose(p1, p0, atol=1e-4)
    assert int(st.n_alive) == 2
    # they bounced: velocities separated
    v = np.asarray(st.vel)[np.asarray(st.alive)]
    assert v[0, 0] < v[1, 0]


def test_bounce_restitution_two_equal_bodies():
    """Head-on equal-mass bounce: outgoing normal speed = e * incoming
    (e = 0.2, index.html:328), exact for an isolated pair (Jacobi == sweep)."""
    cfg = SimConfig(capacity=8, G=0.0, dt=1e-5, sub_steps=1,
                    fracture_threshold=1e9, merge_time=1e9)
    st = _two_body_state(cfg, v=(1.0, -1.0))
    st, ev = sim.step(st, cfg)
    v = np.asarray(st.vel)[np.asarray(st.alive)]
    # relative normal speed was 2.0 -> after bounce 0.2 * 2.0, split evenly
    np.testing.assert_allclose(v[:, 0], [-0.2, 0.2], atol=1e-4)


def test_merge_after_contact_time():
    """Pair in sustained slow contact merges once contactTime > mergeTime
    (index.html:340-346), conserving mass, momentum, and mass-weighted temp."""
    # merge_time below one substep h=0.008: the first approaching contact
    # substep already satisfies contactTime > mergeTime (the reference
    # accumulates BEFORE the branch check, index.html:318-319 vs 340).
    cfg = SimConfig(capacity=8, G=0.0, merge_time=0.005, fracture_threshold=1e9)
    st = _two_body_state(cfg, v=(0.05, -0.05), gap_frac=0.5)
    p0 = np.asarray(jnp.sum(st.mass[:, None] * st.vel, axis=0))
    m0 = float(st.mass.sum())
    st, ev = _run_frames(st, cfg, 30)
    assert int(st.n_alive) == 1
    assert float(st.mass.sum()) == pytest.approx(m0, rel=1e-6)
    p1 = np.asarray(jnp.sum(st.mass[:, None] * st.vel, axis=0))
    np.testing.assert_allclose(p1, p0, atol=1e-5)


def test_fracture_on_violent_impact():
    """High-speed impact with Q > fractureThreshold shatters both bodies
    (index.html:348-359), conserving momentum (fragments carry base velocity
    + isotropic scatter; mass within fragment-skip tolerance)."""
    cfg = SimConfig(capacity=64, G=0.0, fracture_threshold=0.5, merge_time=1e9)
    st = _two_body_state(cfg, m=(50.0, 50.0), v=(20.0, -20.0), gap_frac=0.95)
    m0 = float(st.mass.sum())
    st, ev = _run_frames(st, cfg, 3)
    n = int(st.n_alive)
    assert n >= 3, f"expected fragments, got {n} bodies"
    # mass conserved up to skipped sub-threshold fragments
    assert float(st.mass.sum()) <= m0 + 1e-4
    assert float(st.mass.sum()) >= m0 * 0.5
    # fragments are hot (fragTemp = max(TA,TB) + E/M * 0.1, index.html:435)
    assert float(st.temp.max()) > 0


def test_fracture_momentum_conservation():
    cfg = SimConfig(capacity=64, G=0.0, fracture_threshold=0.5, merge_time=1e9)
    st = _two_body_state(cfg, m=(50.0, 30.0), v=(20.0, -20.0), gap_frac=0.95)
    p0 = np.asarray(jnp.sum(st.mass[:, None] * st.vel, axis=0))
    st, ev = sim.step(st, cfg)
    if int(ev.n_fractures.sum()) == 0:
        st, ev = sim.step(st, cfg)
    assert int(st.n_alive) >= 3
    # Each fragment's velocity is baseVel + scatter*speed with random isotropic
    # scatter (index.html:430-434), so momentum is conserved only in
    # expectation; verify total mass * baseVel structure loosely.
    p1 = np.asarray(jnp.sum(st.mass[:, None] * st.vel, axis=0))
    m1 = float(st.mass.sum())
    eject = float(jnp.sqrt(jnp.sum(st.vel**2, axis=-1).max()))
    assert np.linalg.norm(p1 - p0 * (m1 / 80.0)) <= m1 * eject


def test_small_bodies_bounce_not_fracture():
    """Fracture requires a parent above minFragmentMass (index.html:354)."""
    cfg = SimConfig(capacity=8, G=0.0, fracture_threshold=1e-6,
                    min_fragment_mass=1.0, merge_time=1e9)
    st = _two_body_state(cfg, m=(0.5, 0.5), v=(5.0, -5.0), gap_frac=0.9)
    st, ev = sim.step(st, cfg)
    assert int(ev.n_fractures.sum()) == 0
    assert int(st.n_alive) == 2


def test_separating_pair_untouched():
    """Non-approaching overlap does nothing but accumulate contact time
    (velAlongNormal >= 0 gate, index.html:327)."""
    cfg = SimConfig(capacity=8, G=0.0)
    st = _two_body_state(cfg, v=(-1.0, 1.0))  # separating
    v0 = np.asarray(st.vel).copy()
    st, ev = sim.step(st, cfg)
    np.testing.assert_allclose(np.asarray(st.vel), v0, atol=1e-7)
    assert int(ev.n_bounces.sum()) == 0


def test_contact_timer_accumulates_and_prunes():
    cfg = SimConfig(capacity=8, G=0.0, merge_time=1e9, fracture_threshold=1e9)
    st = _two_body_state(cfg, v=(0.0, 0.0), gap_frac=0.5)
    h = cfg.dt / cfg.sub_steps
    st1, _ = sim.step(st, cfg)
    c1 = float(st1.contact[0, 1])
    np.testing.assert_allclose(c1, cfg.dt, rtol=1e-5)  # 2 substeps of h
    # separate them -> timer prunes to zero (index.html:376-380)
    st2 = st1.replace(pos=st1.pos.at[1].set(jnp.array([100.0, 0, 0])))
    st2, _ = sim.step(st2, cfg)
    assert float(st2.contact[0, 1]) == 0.0


def test_heating_on_impact():
    """Approaching overlap heats both bodies by (E/m) * 0.2
    (index.html:335-336)."""
    cfg = SimConfig(capacity=8, G=0.0, fracture_threshold=1e9, merge_time=1e9)
    st = _two_body_state(cfg, v=(2.0, -2.0))
    assert float(st.temp.max()) == 0.0
    st, _ = sim.step(st, cfg)
    temps = np.asarray(st.temp)[np.asarray(st.alive)]
    assert (temps > 0).all()


def test_thermal_decay_and_snap():
    cfg = SimConfig(capacity=4, G=0.0, collisions=True)
    st = empty_state(cfg)
    st, _ = add_body(st, 1.0, jnp.zeros(3), jnp.zeros(3), ROCK, temp=100.0)
    st, _ = sim.step(st, cfg)
    # two substeps of decay: 100 * 0.998^2
    np.testing.assert_allclose(float(st.temp[0]), 100 * 0.998**2, rtol=1e-5)
    st = st.replace(temp=st.temp.at[0].set(0.1000001))
    st, _ = sim.step(st, cfg)
    assert float(st.temp[0]) == 0.0  # snap below 0.1 (index.html:229)


def test_event_overflow_counted_and_deferred():
    """More simultaneous merge pairs than max_merges: the overflow is
    counted in n_dropped (no-silent-caps) and the leftover pairs merge on
    subsequent frames (contact timers persist)."""
    cfg = SimConfig(capacity=64, G=0.0, merge_time=0.005,
                    fracture_threshold=1e9, max_merges=4)
    st = empty_state(cfg, 0)
    # 12 well-separated touching pairs, gently approaching
    for k in range(12):
        base = jnp.array([k * 50.0, 0.0, 0.0])
        st, _ = add_body(st, 10.0, base, jnp.array([0.05, 0, 0]), ROCK)
        st, _ = add_body(st, 10.0, base + jnp.array([2.0, 0, 0]),
                         jnp.array([-0.05, 0, 0]), ROCK)
    m0 = float(st.mass.sum())
    st, ev = sim.step(st, cfg)
    assert int(np.asarray(ev.n_merges).sum()) <= 8  # 4 per substep max
    assert int(np.asarray(ev.n_dropped).sum()) > 0  # overflow surfaced
    for _ in range(10):
        st, ev = sim.step(st, cfg)
    assert int(st.n_alive) == 12  # every pair eventually merged
    assert float(st.mass.sum()) == pytest.approx(m0, rel=1e-6)
