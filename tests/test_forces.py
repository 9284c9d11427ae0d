"""Force-law unit tests (reference computeGravity, index.html:264-291)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbx import forces


def _numpy_acc(pos, mass, G, eps):
    n = len(pos)
    acc = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[j] - pos[i]
            f = G / (d @ d + eps * eps) ** 1.5
            acc[i] += f * mass[j] * d
    return acc


@pytest.mark.parametrize("n", [2, 7, 64])
def test_dense_matches_numpy(n):
    rng = np.random.default_rng(n)
    pos = rng.normal(size=(n, 3)) * 10
    mass = rng.uniform(0.5, 5.0, n)
    got = forces.accelerations(jnp.asarray(pos, jnp.float32), jnp.asarray(mass, jnp.float32), 0.5, 0.5)
    want = _numpy_acc(pos, mass, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-6)


def test_zero_softening_diagonal_safe():
    pos = jnp.array([[0.0, 0, 0], [1, 0, 0]])
    mass = jnp.array([1.0, 1.0])
    acc = forces.accelerations(pos, mass, 1.0, 0.0)
    assert np.isfinite(np.asarray(acc)).all()
    np.testing.assert_allclose(np.asarray(acc)[0], [1.0, 0, 0], rtol=1e-6)


def test_dead_bodies_exert_no_force():
    pos = jnp.array([[0.0, 0, 0], [10, 0, 0], [5, 0, 0]])
    mass = jnp.array([1.0, 1.0, 0.0])  # third body dead (mass 0)
    acc = forces.accelerations(pos, mass, 1.0, 0.1)
    acc2 = forces.accelerations(pos[:2], mass[:2], 1.0, 0.1)
    np.testing.assert_allclose(np.asarray(acc[:2]), np.asarray(acc2), rtol=1e-6)


@pytest.mark.parametrize("block", [32, 128])
def test_blocked_matches_dense(block):
    rng = np.random.default_rng(0)
    n = 256
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 10, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    dense = forces.accelerations(pos, mass, 0.5, 0.5)
    blocked = forces.accelerations_blocked(pos, mass, 0.5, 0.5, block)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense), rtol=1e-5, atol=1e-6)


def test_potential_energy_blocked_matches_dense():
    rng = np.random.default_rng(1)
    n = 128
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 10, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    u_dense = forces.potential_energy(pos, mass, 0.5, 0.5)
    u_blocked = forces.potential_energy(pos, mass, 0.5, 0.5, block=32)
    np.testing.assert_allclose(float(u_blocked), float(u_dense), rtol=1e-5)


def test_momentum_conserving():
    """Newton's third law: sum of m*a is zero (the reference applies +/-
    symmetric pair forces, index.html:282-288)."""
    rng = np.random.default_rng(2)
    n = 50
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 5, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5.0, n), jnp.float32)
    acc = forces.accelerations(pos, mass, 0.5, 0.5)
    total = np.asarray(jnp.sum(mass[:, None] * acc, axis=0))
    np.testing.assert_allclose(total, 0.0, atol=1e-3)
