"""Dense (jnp) softened pairwise gravity — oracle and small-N path.

Physics semantics from the reference's computeGravity (index.html:264-291):
Plummer softening, f = G / (d^2 + eps^2)^(3/2), acc_i += f * m_j * (p_j - p_i).
The i == j term is exactly zero (finite f times zero displacement) as long as
eps > 0; for eps == 0 the diagonal is masked explicitly.

For large N the O(N^2) memory of the fully dense form is avoided by a
row-blocked `lax.map` variant; the production hot path is the Pallas kernel
in nbx.ops.pairwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accelerations(
    pos: jax.Array, mass: jax.Array, G: jax.Array | float, softening: jax.Array | float
) -> jax.Array:
    """Direct-sum softened gravity, O(N^2) memory. pos [N,3], mass [N] -> acc [N,3]."""
    d = pos[None, :, :] - pos[:, None, :]  # d[i, j] = p_j - p_i (index.html:277)
    eps2 = jnp.asarray(softening, pos.dtype) ** 2
    r2 = jnp.sum(d * d, axis=-1) + eps2
    n = pos.shape[0]
    # Guard zero distances for eps == 0: the diagonal, AND coincident pairs
    # (e.g. dead capacity slots all parked at the origin) — 0^-1.5 * 0 = nan.
    zero = (r2 <= 0.0) | jnp.eye(n, dtype=bool)
    safe = jnp.where(zero, 1.0, r2)
    f = G * jax.lax.rsqrt(safe) / safe  # G / r2^(3/2) (index.html:280)
    w = jnp.where(zero, 0.0, f * mass[None, :])
    return jnp.einsum("ij,ijc->ic", w, d)


def accelerations_blocked(
    pos: jax.Array,
    mass: jax.Array,
    G: jax.Array | float,
    softening: jax.Array | float,
    block: int = 1024,
) -> jax.Array:
    """Same physics, O(N * block) memory via lax.map over row blocks.

    N must be a multiple of `block` (pad with mass-0 bodies otherwise).
    """
    n = pos.shape[0]
    assert n % block == 0, f"N={n} not divisible by block={block}"
    eps2 = jnp.asarray(softening, pos.dtype) ** 2

    def row_block(i0):
        pi = jax.lax.dynamic_slice_in_dim(pos, i0, block, axis=0)  # [B,3]
        d = pos[None, :, :] - pi[:, None, :]  # [B,N,3]
        r2 = jnp.sum(d * d, axis=-1) + eps2
        safe = jnp.where(r2 > 0, r2, 1.0)
        f = G * jax.lax.rsqrt(safe) / safe
        w = jnp.where(r2 > 0, f * mass[None, :], 0.0)
        return jnp.einsum("ij,ijc->ic", w, d)

    starts = jnp.arange(0, n, block)
    out = jax.lax.map(row_block, starts)  # [n/block, B, 3]
    return out.reshape(n, 3)


def acc_and_jerk(
    pos: jax.Array,
    mass: jax.Array,
    vel: jax.Array,
    G: jax.Array | float,
    softening: jax.Array | float,
) -> tuple[jax.Array, jax.Array]:
    """Softened acceleration AND its time derivative (jerk) — the force
    evaluation the 4th-order Hermite scheme needs (nbx.integrators.hermite):

        acc_i  = G sum_j m_j d_ij / s^3,           s^2 = |d|^2 + eps^2
        jerk_i = G sum_j m_j [ v_ij / s^3 - 3 (d_ij . v_ij) d_ij / s^5 ]

    Same pair masking rules as accelerations(). The reference has no such
    integrator (its loop is the KDK of index.html:247-262); this is a
    beyond-reference capability for high-accuracy few-body work.
    """
    d = pos[None, :, :] - pos[:, None, :]  # d[i, j] = p_j - p_i
    dv = vel[None, :, :] - vel[:, None, :]
    eps2 = jnp.asarray(softening, pos.dtype) ** 2
    r2 = jnp.sum(d * d, axis=-1) + eps2
    n = pos.shape[0]
    zero = (r2 <= 0.0) | jnp.eye(n, dtype=bool)
    safe = jnp.where(zero, 1.0, r2)
    inv = jax.lax.rsqrt(safe)
    inv3 = inv / safe  # s^-3
    w = jnp.where(zero, 0.0, G * mass[None, :] * inv3)
    acc = jnp.einsum("ij,ijc->ic", w, d)
    rv = jnp.sum(d * dv, axis=-1)  # d . v per pair
    jerk = jnp.einsum("ij,ijc->ic", w, dv) - jnp.einsum(
        "ij,ijc->ic", w * 3.0 * rv / safe, d
    )
    return acc, jerk


def potential_energy(
    pos: jax.Array,
    mass: jax.Array,
    G: jax.Array | float,
    softening: jax.Array | float,
    block: int | None = None,
) -> jax.Array:
    """Softened potential energy consistent with the force law:
    U = -G * sum_{i<j} m_i m_j / sqrt(d^2 + eps^2).

    The reference never computes energy; this is the diagnostics quantity the
    drift gates (SURVEY.md section 4.3) are expressed in.
    """
    eps2 = jnp.asarray(softening, pos.dtype) ** 2
    n = pos.shape[0]
    if block is None:
        d = pos[None, :, :] - pos[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + eps2
        zero = (r2 <= 0.0) | jnp.eye(n, dtype=bool)
        inv_r = jax.lax.rsqrt(jnp.where(zero, 1.0, r2))
        mm = mass[:, None] * mass[None, :]
        mm = jnp.where(zero, 0.0, mm)
        return -0.5 * G * jnp.sum(mm * inv_r)

    assert n % block == 0

    def row_block(i0):
        pi = jax.lax.dynamic_slice_in_dim(pos, i0, block, axis=0)
        mi = jax.lax.dynamic_slice_in_dim(mass, i0, block, axis=0)
        d = pos[None, :, :] - pi[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + eps2
        row = jax.lax.broadcasted_iota(jnp.int32, (block, n), 0) + i0
        col = jax.lax.broadcasted_iota(jnp.int32, (block, n), 1)
        zero = (row == col) | (r2 <= 0.0)
        r2 = jnp.where(zero, 1.0, r2)
        mm = jnp.where(zero, 0.0, mi[:, None] * mass[None, :])
        return jnp.sum(mm * jax.lax.rsqrt(r2))

    total = jnp.sum(jax.lax.map(row_block, jnp.arange(0, n, block)))
    return -0.5 * G * total


def kinetic_energy(vel: jax.Array, mass: jax.Array) -> jax.Array:
    return 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))
