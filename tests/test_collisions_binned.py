"""Binned bounce resolution: equivalence with the dense path, conservation,
and the granular loop."""

import jax.numpy as jnp
import numpy as np

from nbx.collisions import resolve_collisions
from nbx.collisions_binned import granular_kdk_scan, resolve_bounces_binned
from nbx.config import ROCK, SimConfig, body_radius, default_materials
from nbx.state import add_bodies, empty_state


def _granular_scene(n=96, seed=0, box=100.0):
    """Dense-enough random balls that several pairs overlap."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(20, 50, (n, 3)).astype(np.float32)
    vel = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    mass = rng.uniform(5.0, 20.0, n).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass)


def test_binned_matches_dense_bounces():
    """On a scene with only bounces, the binned resolver reproduces the
    dense masked resolver's position/velocity updates."""
    pos, vel, mass = _granular_scene()
    n = mass.shape[0]
    cfg = SimConfig(capacity=n, G=0.0, merge_time=1e9, fracture_threshold=1e9)
    st = empty_state(cfg, 0)
    st = add_bodies(st, mass, pos, vel, jnp.full((n,), ROCK, jnp.int32))
    radius = st.radius(cfg)

    dense, _ = resolve_collisions(st, cfg, 0.008)
    dp, dv, dt, n_b, ovf, too_small = resolve_bounces_binned(
        pos, vel, mass, radius, 100.0, n_cells=8, max_per_cell=64,
        restitution=cfg.restitution, friction=cfg.friction,
    )
    assert not bool(too_small) and int(ovf) == 0
    assert int(n_b) > 0, "scene should produce bounces"
    np.testing.assert_allclose(
        np.asarray(pos + dp), np.asarray(dense.pos), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vel + dv), np.asarray(dense.vel), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st.temp + dt), np.asarray(dense.temp), rtol=1e-4, atol=1e-6
    )


def test_binned_conserves_momentum():
    pos, vel, mass = _granular_scene(seed=3)
    mats = default_materials()
    radius = body_radius(mass, jnp.zeros_like(mass, dtype=jnp.int32), mats)
    dp, dv, _, n_b, _, _ = resolve_bounces_binned(
        pos, vel, mass, radius, 100.0, n_cells=8, max_per_cell=64
    )
    assert int(n_b) > 0
    dP = np.asarray((mass[:, None] * dv).sum(0))
    scale = float((mass[:, None] * jnp.abs(vel)).sum())
    np.testing.assert_allclose(dP, 0.0, atol=1e-5 * scale)


def test_cell_too_small_flagged():
    pos, vel, mass = _granular_scene(seed=1)
    big_radius = jnp.full_like(mass, 30.0)  # 2r = 60 > cell = 12.5
    *_, too_small = resolve_bounces_binned(
        pos, vel, mass, big_radius, 100.0, n_cells=8, max_per_cell=64
    )
    assert bool(too_small)


def test_granular_loop_runs_and_settles():
    """A box of bouncing balls under zero gravity loses kinetic energy to
    restitution < 1 and stays finite."""
    pos, vel, mass = _granular_scene(seed=2, n=64)
    mats = default_materials()
    radius = body_radius(mass, jnp.zeros_like(mass, dtype=jnp.int32), mats)
    ke0 = float((0.5 * mass * jnp.sum(vel * vel, 1)).sum())
    p, v, t, nb, ovf, flags = granular_kdk_scan(
        pos, vel, mass, radius, 0.0, 0.5, 0.004, 100.0, 60,
        n_cells=8, max_per_cell=64, force_impl="blocked",
    )
    assert int(nb) > 0 and int(ovf) == 0
    assert not bool(flags["cell_too_small"])
    assert int(flags["max_out_of_box"]) == 0  # scene stays in the box
    assert np.isfinite(np.asarray(p)).all()
    ke1 = float((0.5 * mass * jnp.sum(np.asarray(v) ** 2, 1)).sum())
    assert ke1 < ke0  # inelastic bounces dissipate
    assert float(t.max()) > 0  # dissipated energy became heat
