"""Particle-mesh solver tests: CIC deposit/gather, Poisson solve vs direct
sum, momentum balance."""

import jax.numpy as jnp
import numpy as np

from nbx import forces
from nbx.ops.pm import cic_deposit, cic_gather, pm_acceleration


def _cluster(n=2048, seed=0, box=100.0):
    rng = np.random.default_rng(seed)
    r = 8.0 / np.sqrt(rng.uniform(0.05, 1, n) ** (-2 / 3) - 1)
    r = np.clip(r, 0, 25)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = (box / 4 + r[:, None] * d).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(mass), box


def test_cic_deposit_conserves_mass():
    pos, mass, box = _cluster(512)
    grid = cic_deposit(pos, mass, box, 32)
    np.testing.assert_allclose(float(grid.sum()), float(mass.sum()), rtol=1e-5)


def test_cic_gather_constant_field():
    """Gathering a constant field returns the constant (partition of unity)."""
    pos, mass, box = _cluster(256)
    field = jnp.ones((16, 16, 16, 3)) * jnp.array([1.0, 2.0, 3.0])
    out = np.asarray(cic_gather(field, pos, box, 16))
    np.testing.assert_allclose(out, np.tile([1.0, 2, 3], (256, 1)), rtol=1e-5)


def test_pm_matches_direct_sum_bulk():
    """PM forces track the direct sum on a smooth cluster to PM's grid-scale
    accuracy (median < 10%, isolated boundaries)."""
    pos, mass, box = _cluster(2048)
    direct = np.asarray(forces.accelerations_blocked(pos, mass, 1.0, 0.5, 1024))
    acc = np.asarray(pm_acceleration(pos, mass, 1.0, box, g=64, isolated=True))
    err = np.linalg.norm(acc - direct, axis=1) / (
        np.linalg.norm(direct, axis=1) + 1e-9
    )
    assert np.median(err) < 0.10, f"median PM error {np.median(err):.3f}"
    # directions agree for the bulk
    cos = np.sum(acc * direct, 1) / (
        np.linalg.norm(acc, axis=1) * np.linalg.norm(direct, axis=1) + 1e-9
    )
    assert np.median(cos) > 0.99


def test_pm_periodic_runs_and_is_finite():
    pos, mass, box = _cluster(512)
    acc = np.asarray(pm_acceleration(pos, mass, 1.0, box, g=32, isolated=False))
    assert np.isfinite(acc).all()
    assert np.abs(acc).max() > 0


def test_pm_momentum_balance():
    """Total m*a stays small relative to the typical force scale (CIC
    deposit/gather with the same window is near momentum-conserving)."""
    pos, mass, box = _cluster(1024, seed=3)
    acc = np.asarray(pm_acceleration(pos, mass, 1.0, box, g=64, isolated=True))
    total = np.abs((np.asarray(mass)[:, None] * acc).sum(0)).max()
    scale = float(np.abs(np.asarray(mass)[:, None] * acc).sum())
    assert total < 0.02 * scale, f"momentum imbalance {total / scale:.4f}"


def test_pm_two_clumps_attract():
    """Two separated clumps accelerate toward each other under PM."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(256, 3)) * 2 + np.array([30.0, 50, 50])
    b = rng.normal(size=(256, 3)) * 2 + np.array([70.0, 50, 50])
    pos = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    mass = jnp.ones(512)
    acc = np.asarray(pm_acceleration(pos, mass, 1.0, 100.0, g=64, isolated=True))
    assert acc[:256, 0].mean() > 0  # left clump pulled right
    assert acc[256:, 0].mean() < 0


def test_pm_kdk_scan_runs():
    from nbx.ops.pm import pm_kdk_scan

    pos, mass, box = _cluster(256, seed=5)
    vel = jnp.zeros_like(pos)
    p, v, oob = pm_kdk_scan(
        pos, vel, mass, 1.0, box, 1e-3, 10, g=32, isolated=True
    )
    assert np.isfinite(np.asarray(p)).all() and np.isfinite(np.asarray(v)).all()
    assert np.abs(np.asarray(v)).max() > 0  # gravity actually acted
    assert int(oob) == 0  # cluster stays inside the box


def test_isolated_cic_does_not_wrap():
    """A body just outside the low box face must NOT deposit mass at the
    opposite grid face under isolated boundaries (ADVICE round-1 medium):
    out-of-range CIC weights are dropped, not wrapped."""
    box, g = 100.0, 32
    pos = jnp.array([[-0.1, 50.0, 50.0]])  # below x=0 face
    mass = jnp.ones(1)
    grid = np.asarray(cic_deposit(pos, mass, box, g, periodic=False))
    assert grid[-1].sum() == 0.0  # nothing wrapped to the high-x face
    assert 0.0 < grid.sum() < 1.0  # partial weight dropped, rest at x=0
    # periodic mode still wraps (unchanged behavior)
    grid_p = np.asarray(cic_deposit(pos, mass, box, g, periodic=True))
    assert grid_p[-1].sum() > 0.0
    np.testing.assert_allclose(grid_p.sum(), 1.0, rtol=1e-6)


def test_isolated_out_of_box_body_decouples():
    """A body far outside [0, box)^3 exerts ~no force on in-box bodies and
    feels none itself (previously it acted from ~box away via the wrap)."""
    box = 100.0
    pos = jnp.array([[50.0, 50.0, 50.0], [99.5, 50.0, 50.0], [-300.0, 50.0, 50.0]])
    mass = jnp.array([1.0, 1.0, 1e6])  # huge outside mass
    acc = np.asarray(pm_acceleration(pos, mass, 1.0, box, g=32, isolated=True))
    # outside body gathers zero field
    np.testing.assert_allclose(acc[2], 0.0, atol=1e-12)
    # in-box pair: forces stay at the two-body scale, not dominated by the
    # phantom 1e6 mass (pair separation ~49.5 -> |a| ~ 4e-4)
    assert np.abs(acc[:2]).max() < 0.1


def test_out_of_box_count():
    from nbx.ops.pm import out_of_box_count

    pos = jnp.array([[1.0, 1, 1], [-0.1, 5, 5], [5, 100.0, 5], [99.9, 99.9, 99.9]])
    assert int(out_of_box_count(pos, 100.0)) == 2
