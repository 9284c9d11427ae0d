"""Time integrators for pure-gravity systems.

The reference's integrate() is a kick-drift-kick velocity-Verlet/leapfrog
(index.html:247-262): half-kick with the *previous* acceleration, drift, force
evaluation, half-kick with the new acceleration. The very first step's first
half-kick is a no-op because Body ctor zeroes acc (index.html:217).

These integrators cover the gravity-only path (Kepler / Plummer / scaling
runs, BASELINE configs 2-4). The full reference step with collisions
interleaved between force evaluation and the second half-kick lives in
nbx.sim (order matters: index.html:255-259).

All integrators are pure functions over (pos, vel, acc) and a force callback,
shaped for `jax.lax.scan`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

ForceFn = Callable[[jax.Array], jax.Array]  # pos [N,3] -> acc [N,3]


class PhaseState(NamedTuple):
    pos: jax.Array
    vel: jax.Array
    acc: jax.Array


def kdk_step(s: PhaseState, h: jax.Array | float, force: ForceFn) -> PhaseState:
    """Kick-drift-kick leapfrog, the reference ordering (index.html:247-262)."""
    vel = s.vel + s.acc * (0.5 * h)
    pos = s.pos + vel * h
    acc = force(pos)
    vel = vel + acc * (0.5 * h)
    return PhaseState(pos, vel, acc)


def dkd_step(s: PhaseState, h: jax.Array | float, force: ForceFn) -> PhaseState:
    """Drift-kick-drift leapfrog (same order of accuracy, ablation variant)."""
    pos = s.pos + s.vel * (0.5 * h)
    acc = force(pos)
    vel = s.vel + acc * h
    pos = pos + vel * (0.5 * h)
    return PhaseState(pos, vel, acc)


def symplectic_euler_step(
    s: PhaseState, h: jax.Array | float, force: ForceFn
) -> PhaseState:
    """First-order symplectic Euler (kick then drift) — ablation variant."""
    acc = force(s.pos)
    vel = s.vel + acc * h
    pos = s.pos + vel * h
    return PhaseState(pos, vel, acc)


def explicit_euler_step(
    s: PhaseState, h: jax.Array | float, force: ForceFn
) -> PhaseState:
    """Plain explicit Euler — energy-drifting strawman for the test suite."""
    acc = force(s.pos)
    pos = s.pos + s.vel * h
    vel = s.vel + acc * h
    return PhaseState(pos, vel, acc)


STEPPERS = {
    "kdk": kdk_step,
    "dkd": dkd_step,
    "symplectic_euler": symplectic_euler_step,
    "euler": explicit_euler_step,
}


class HermiteState(NamedTuple):
    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    jerk: jax.Array


# pos [N,3], vel [N,3] -> (acc [N,3], jerk [N,3])
ForceJerkFn = Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]


def init_hermite(pos, vel, force_jerk: ForceJerkFn) -> HermiteState:
    acc, jerk = force_jerk(pos, vel)
    return HermiteState(pos, vel, acc, jerk)


def hermite_step(
    s: HermiteState, h: jax.Array | float, force_jerk: ForceJerkFn
) -> HermiteState:
    """4th-order Hermite predictor-corrector (Makino & Aarseth 1992): one
    force+jerk evaluation per step, two-point Hermite-interpolation
    corrector. ~h^4 energy error vs the leapfrog's h^2 — the high-accuracy
    few-body integrator the N-body performance literature builds on
    (PAPERS.md: Hermite-scheme tuning). Beyond-reference capability; same
    pure-function shape as the STEPPERS so it scans identically.
    """
    h2 = h * h
    xp = s.pos + s.vel * h + s.acc * (h2 / 2.0) + s.jerk * (h2 * h / 6.0)
    vp = s.vel + s.acc * h + s.jerk * (h2 / 2.0)
    a1, j1 = force_jerk(xp, vp)
    v1 = s.vel + (s.acc + a1) * (h / 2.0) + (s.jerk - j1) * (h2 / 12.0)
    x1 = s.pos + (s.vel + v1) * (h / 2.0) + (s.acc - a1) * (h2 / 12.0)
    return HermiteState(x1, v1, a1, j1)


def run_hermite(
    s: HermiteState,
    h: jax.Array | float,
    n_steps: int,
    force_jerk: ForceJerkFn,
    diagnostics: Callable[[HermiteState], jax.Array] | None = None,
    unroll: int = 1,
):
    """Integrate n_steps of the Hermite scheme under lax.scan."""

    def body(carry, _):
        nxt = hermite_step(carry, h, force_jerk)
        out = diagnostics(nxt) if diagnostics is not None else None
        return nxt, out

    return jax.lax.scan(body, s, None, length=n_steps, unroll=unroll)


def init_phase(pos: jax.Array, vel: jax.Array, force: ForceFn | None = None) -> PhaseState:
    """Initial phase state. The reference starts with acc = 0
    (index.html:217) so the first half-kick is a no-op; pass `force` to start
    with a consistent acceleration instead (standard leapfrog warm start)."""
    acc = jnp.zeros_like(pos) if force is None else force(pos)
    return PhaseState(pos, vel, acc)


def run(
    s: PhaseState,
    h: jax.Array | float,
    n_steps: int,
    force: ForceFn,
    method: str = "kdk",
    diagnostics: Callable[[PhaseState], jax.Array] | None = None,
    unroll: int = 1,
    compensated: bool = False,
):
    """Integrate n_steps under lax.scan. Returns (final_state, per-step diag).

    compensated=True (KDK only) uses Kahan-compensated position/velocity
    updates: over 10^4+ steps in f32 the per-step update roundoff
    (~1e-7 |x|) otherwise accumulates into a visible energy-drift floor
    (measured in the Plummer gate, nbx/bench/drift.py).
    """
    if compensated:
        if method != "kdk":
            raise ValueError("compensated integration implemented for kdk only")

        def kadd(x, c, dx):
            y = dx - c
            t = x + y
            return t, (t - x) - y

        def body(carry, _):
            st, pc, vc = carry
            v, vc = kadd(st.vel, vc, st.acc * (0.5 * h))
            p, pc = kadd(st.pos, pc, v * h)
            a = force(p)
            v, vc = kadd(v, vc, a * (0.5 * h))
            nxt = PhaseState(p, v, a)
            out = diagnostics(nxt) if diagnostics is not None else None
            return (nxt, pc, vc), out

        zero = jnp.zeros_like(s.pos)
        (s, _, _), diag = jax.lax.scan(
            body, (s, zero, zero), None, length=n_steps, unroll=unroll
        )
        return s, diag

    stepper = STEPPERS[method]

    def body(carry, _):
        nxt = stepper(carry, h, force)
        out = diagnostics(nxt) if diagnostics is not None else None
        return nxt, out

    return jax.lax.scan(body, s, None, length=n_steps, unroll=unroll)
