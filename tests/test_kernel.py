"""Pallas kernel equivalence tests (interpret mode on CPU; the real-TPU
numerics are covered by the bench harness and were validated on-chip —
see .claude/skills/verify/SKILL.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbx import forces
from nbx.ops.pairwise import (
    pairwise_acc,
    pairwise_acc_jerk,
    potential_energy,
    potential_per_body,
)


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 20, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5, n), jnp.float32)
    return pos, mass


@pytest.mark.parametrize("n", [64, 300, 777])
@pytest.mark.parametrize("tiles", [(8, 128), (64, 256)])
def test_acc_matches_dense(n, tiles):
    """Tile sweep including N not divisible by tile (SURVEY.md section 4.4)."""
    pos, mass = _rand(n, n)
    want = forces.accelerations(pos, mass, 0.5, 0.5)
    got = pairwise_acc(
        pos, mass, 0.5, 0.5, tile_i=tiles[0], tile_j=tiles[1], interpret=True
    )
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3 * scale)


def test_rectangular_targets():
    """Sharded path: force of all sources on a target subset."""
    pos, mass = _rand(300, 1)
    tpos = pos[37:137]
    want = forces.accelerations(pos, mass, 0.5, 0.5)[37:137]
    got = pairwise_acc(
        pos, mass, 0.5, 0.5, target_pos=tpos, tile_i=8, tile_j=128, interpret=True
    )
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3 * scale)


@pytest.mark.parametrize("n", [64, 300])
def test_acc_jerk_matches_dense(n):
    """The Hermite kernel's acc and jerk match the dense jnp formulation
    (which is itself finite-difference gated, tests/test_integrators.py)."""
    rng = np.random.default_rng(n)
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 20, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 3)) * 2, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5, n), jnp.float32)
    want_a, want_j = forces.acc_and_jerk(pos, mass, vel, 0.5, 0.5)
    got_a, got_j = pairwise_acc_jerk(
        pos, mass, vel, 0.5, 0.5, tile_i=8, tile_j=128, interpret=True
    )
    sa = float(jnp.abs(want_a).max())
    sj = float(jnp.abs(want_j).max())
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               atol=2e-3 * sa)
    np.testing.assert_allclose(np.asarray(got_j), np.asarray(want_j),
                               atol=2e-3 * sj)


def test_acc_jerk_rectangular_targets():
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.normal(size=(300, 3)) * 20, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(300, 3)) * 2, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5, 300), jnp.float32)
    want_a, want_j = forces.acc_and_jerk(pos, mass, vel, 0.5, 0.5)
    got_a, got_j = pairwise_acc_jerk(
        pos, mass, vel, 0.5, 0.5, target_pos=pos[37:137],
        target_vel=vel[37:137], tile_i=8, tile_j=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a[37:137]),
                               atol=2e-3 * float(jnp.abs(want_a).max()))
    np.testing.assert_allclose(np.asarray(got_j), np.asarray(want_j[37:137]),
                               atol=2e-3 * float(jnp.abs(want_j).max()))


def test_mass_zero_padding_is_inert():
    """Dead/padding bodies (mass 0) contribute exactly zero force."""
    pos, mass = _rand(100, 2)
    mass = mass.at[50:].set(0.0)
    want = forces.accelerations(pos[:50], mass[:50], 0.5, 0.5)
    got = pairwise_acc(pos, mass, 0.5, 0.5, tile_i=8, tile_j=128, interpret=True)[:50]
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3 * scale)


def test_potential_matches_dense():
    pos, mass = _rand(256, 3)
    want = float(forces.potential_energy(pos, mass, 0.5, 0.5))
    got = float(
        potential_energy(pos, mass, 0.5, 0.5, tile_i=8, tile_j=128, interpret=True)
    )
    assert abs(got - want) / abs(want) < 1e-4


def test_potential_rectangular_self_term():
    """Per-body phi with targets = a source slice subtracts exactly one
    self term per target."""
    pos, mass = _rand(200, 4)
    phi_full = potential_per_body(
        pos, mass, 0.5, 0.5, tile_i=8, tile_j=128, interpret=True
    )
    phi_slice = potential_per_body(
        pos,
        mass,
        0.5,
        0.5,
        target_pos=pos[60:90],
        target_mass=mass[60:90],
        tile_i=8,
        tile_j=128,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(phi_slice), np.asarray(phi_full[60:90]), rtol=1e-5
    )


def test_bf16_precision_budget():
    """bf16-pairwise variant stays within its documented error budget
    (BASELINE config 4 precision study)."""
    pos, mass = _rand(300, 5)
    want = forces.accelerations(pos, mass, 0.5, 0.5)
    got = pairwise_acc(
        pos, mass, 0.5, 0.5, tile_i=8, tile_j=128, precision="bf16", interpret=True
    )
    scale = float(jnp.abs(want).max())
    err = float(jnp.abs(got - want).max()) / scale
    assert err < 0.05, f"bf16 rel err {err}"
    assert err > 0, "bf16 path identical to f32 — cast not happening?"


def test_mxu_precision_budget():
    """MXU-r^2 prototype variant stays within its documented error budget
    (r^2 cancellation + bf16-split accumulation; docs/RESULTS.md round 2)."""
    pos, mass = _rand(300, 7)
    want = forces.accelerations(pos, mass, 0.5, 0.5)
    got = pairwise_acc(
        pos, mass, 0.5, 0.5, tile_i=8, tile_j=128, precision="mxu",
        interpret=True,
    )
    scale = float(jnp.abs(want).max())
    err = float(jnp.abs(got - want).max()) / scale
    assert err < 0.02, f"mxu rel err {err}"


def test_hyb_precision_budget():
    """Round-3 hybrid (MXU r^2 cross term + centered f32 VPU accumulation)
    stays within the 'mxu' accuracy class (docs/RESULTS.md)."""
    pos, mass = _rand(300, 9)
    want = forces.accelerations(pos, mass, 0.5, 0.5)
    got = pairwise_acc(
        pos, mass, 0.5, 0.5, tile_i=8, tile_j=128, precision="hyb",
        interpret=True,
    )
    scale = float(jnp.abs(want).max())
    err = float(jnp.abs(got - want).max()) / scale
    assert err < 0.02, f"hyb rel err {err}"
