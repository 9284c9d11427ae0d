"""Strict-sequential collision sweep (resolve_collisions_sequential) vs
the NumPy oracle: trajectory-level parity on contact-CLUSTER scenes where
the Jacobi path diverges by construction (in-sweep visibility,
/root/reference/index.html:301-374; SURVEY.md section 7's planned
tiny-N fallback)."""

import numpy as np

import oracle as orc
from nbx import scene, sim
from nbx.config import SimConfig
from nbx.state import compact_arrays


def _run_nbx(sc, cfg, n_frames, collision_impl, key=0):
    st = scene.make_state(cfg, sc, key)
    for _ in range(n_frames):
        st, ev = sim.step(st, cfg, collision_impl=collision_impl)
    return st, ev


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


def _chain_scene(n=5, spacing=2.5, mass=20.0):
    """n bodies of radius ~1.68 on a line at `spacing` < 2 r (all
    neighbor pairs overlap immediately), outer bodies converging: a
    contact PILE where the sequential sweep's earlier impulses change
    later pairs' relative velocities within one substep."""
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = (np.arange(n) - (n - 1) / 2) * spacing
    pos[:, 1] = np.linspace(0.0, 0.3, n)  # slight offsets: no exact ties
    vel = np.zeros((n, 3), np.float32)
    vel[:, 0] = -np.sign(pos[:, 0]) * 1.5
    return dict(
        pos=pos,
        vel=vel,
        mass=np.full(n, mass, np.float32),
        mat=np.zeros(n, np.int32),
        temp=np.zeros(n, np.float32),
    )


def test_sequential_matches_jacobi_on_isolated_pair():
    """<= 1 overlap per body: Jacobi and sequential are the same math."""
    sc = scene.head_on_collision()
    sc["pos"][:, 0] = [-4, 4]
    sc["pos"][:, 2] = [0, 2]
    cfg = SimConfig(capacity=16, merge_time=1e9, fracture_threshold=1e9)
    st_j, _ = _run_nbx(sc, cfg, 100, "jacobi")
    st_s, _ = _run_nbx(sc, cfg, 100, "sequential")
    got_j, got_s = compact_arrays(st_j), compact_arrays(st_s)
    np.testing.assert_allclose(got_s["pos"], got_j["pos"], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got_s["vel"], got_j["vel"], rtol=1e-5,
                               atol=1e-5)


def test_sequential_cluster_matches_oracle_where_jacobi_diverges():
    """5-body contact pile, bounce-only: the sequential path tracks the
    oracle's in-sweep trajectory; the Jacobi path measurably diverges
    from it (the documented O(h) contact-cluster divergence,
    nbx/collisions.py module docstring)."""
    sc = _chain_scene()
    cfg = SimConfig(capacity=8, merge_time=1e9, fracture_threshold=1e9,
                    dt=0.016, sub_steps=2)
    n = 25
    st_s, _ = _run_nbx(sc, cfg, n, "sequential")
    st_j, _ = _run_nbx(sc, cfg, n, "jacobi")
    sys = _run_oracle(sc, cfg, n)
    assert sys.events["bounces"] > 0
    ref_pos = sys.pos_array()
    ref_vel = sys.vel_array()
    got_s = compact_arrays(st_s)
    got_j = compact_arrays(st_j)
    np.testing.assert_allclose(got_s["pos"], ref_pos, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_s["vel"], ref_vel, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_s["temp"], sys.temp_array(), rtol=1e-3,
                               atol=1e-3)
    # the Jacobi path is NOT within the sequential path's tolerance of the
    # oracle here — the divergence this mode exists to close
    err_j = np.abs(got_j["pos"] - ref_pos).max()
    err_s = np.abs(got_s["pos"] - ref_pos).max()
    assert err_j > 10 * max(err_s, 1e-7), (err_j, err_s)


def test_sequential_merge_matches_oracle():
    """Sustained slow contact -> merge; merged body matches the oracle
    (mass, COM, momentum velocity, mass-weighted temperature,
    index.html:392-409) through the sequential path."""
    sc = scene.head_on_collision()
    sc["pos"][:, 0] = [-4, 4]
    sc["pos"][:, 2] = [0, 0]
    cfg = SimConfig(capacity=16, fracture_threshold=1e9)
    n = 160
    st_s, _ = _run_nbx(sc, cfg, n, "sequential")
    sys = _run_oracle(sc, cfg, n)
    assert sys.events["merges"] == 1
    got = compact_arrays(st_s)
    assert int(st_s.n_alive) == len(sys.bodies) == 1
    np.testing.assert_allclose(got["mass"], sys.mass_array(), rtol=1e-5)
    np.testing.assert_allclose(got["pos"], sys.pos_array(), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(got["vel"], sys.vel_array(), rtol=1e-3,
                               atol=1e-3)


def test_sequential_pile_events_match_oracle_counts():
    """A denser pile with merges enabled: event COUNTS (merges, bounces)
    track the oracle sweep's selection order."""
    sc = _chain_scene(n=6, spacing=2.2, mass=10.0)
    cfg = SimConfig(capacity=16, merge_time=0.1, fracture_threshold=1e9,
                    dt=0.016, sub_steps=2)
    sys = _run_oracle(sc, cfg, 30)
    st_s, _ = _run_nbx(sc, cfg, 30, "sequential")
    assert sys.events["merges"] > 0
    got = compact_arrays(st_s)
    assert int(st_s.n_alive) == len(sys.bodies)
    # compare as sets (slot order differs from the oracle's list order)
    np.testing.assert_allclose(
        np.sort(got["mass"]), np.sort(sys.mass_array()), rtol=1e-4
    )
