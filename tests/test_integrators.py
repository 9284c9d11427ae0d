"""Integrator gates: Kepler closed form + energy conservation
(BASELINE config 2; reference KDK ordering index.html:247-262)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbx import forces, integrators, scene


def _force_fn(mass, G, eps):
    return lambda pos: forces.accelerations(pos, mass, G, eps)


def _kepler_setup(e=0.0):
    sc = scene.kepler_two_body(m1=1000.0, m2=1.0, a=50.0, e=e, G=0.5)
    pos = jnp.asarray(sc["pos"], jnp.float64)
    vel = jnp.asarray(sc["vel"], jnp.float64)
    mass = jnp.asarray(sc["mass"], jnp.float64)
    return pos, vel, mass


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_kepler_period():
    """After one analytic period T = 2 pi sqrt(a^3 / GM) the separation
    returns to its start (circular orbit, eps=0)."""
    pos, vel, mass = _kepler_setup(e=0.0)
    G, a = 0.5, 50.0
    T = 2 * np.pi * np.sqrt(a**3 / (G * float(mass.sum())))
    n_steps = 4096
    h = T / n_steps
    s = integrators.init_phase(pos, vel, _force_fn(mass, G, 0.0))
    s, _ = integrators.run(s, h, n_steps, _force_fn(mass, G, 0.0), method="kdk")
    np.testing.assert_allclose(np.asarray(s.pos), np.asarray(pos), atol=5e-3 * a)


@pytest.mark.parametrize("e", [0.0, 0.6])
def test_kepler_energy_conservation(e):
    pos, vel, mass = _kepler_setup(e=e)
    G = 0.5

    def energy(s):
        return forces.kinetic_energy(s.vel, mass) + forces.potential_energy(
            s.pos, mass, G, 0.0
        )

    s = integrators.init_phase(pos, vel, _force_fn(mass, G, 0.0))
    e0 = float(energy(s))
    s, es = integrators.run(
        s, 0.01, 20000, _force_fn(mass, G, 0.0), method="kdk", diagnostics=lambda st: energy(st)
    )
    drift = np.max(np.abs(np.asarray(es) - e0) / abs(e0))
    assert drift < 1e-4, f"energy drift {drift}"


def _fj_fn(mass, G, eps):
    return lambda pos, vel: forces.acc_and_jerk(pos, mass, vel, G, eps)


def test_hermite_fourth_order_and_beats_kdk():
    """The 4th-order Hermite scheme: (a) error shrinks ~16x when h halves
    (order 4), (b) at the same h it conserves energy far better than KDK on
    an eccentric Kepler orbit."""
    pos, vel, mass = _kepler_setup(e=0.6)
    G = 0.5

    def energy(pos_, vel_):
        return forces.kinetic_energy(vel_, mass) + forces.potential_energy(
            pos_, mass, G, 0.0
        )

    e0 = float(energy(pos, vel))

    def hermite_drift(h, n):
        s = integrators.init_hermite(pos, vel, _fj_fn(mass, G, 0.0))
        _, es = integrators.run_hermite(
            s, h, n, _fj_fn(mass, G, 0.0),
            diagnostics=lambda st: energy(st.pos, st.vel),
        )
        return np.max(np.abs(np.asarray(es) - e0) / abs(e0))

    d1 = hermite_drift(0.08, 4000)
    d2 = hermite_drift(0.04, 8000)
    assert d2 < d1 / 8.0, (d1, d2)  # ~16x for order 4; allow headroom

    s = integrators.init_phase(pos, vel, _force_fn(mass, G, 0.0))
    _, es = integrators.run(
        s, 0.08, 4000, _force_fn(mass, G, 0.0), method="kdk",
        diagnostics=lambda st: energy(st.pos, st.vel),
    )
    kdk_drift = np.max(np.abs(np.asarray(es) - e0) / abs(e0))
    assert d1 < kdk_drift / 10.0, (d1, kdk_drift)


def test_jerk_matches_finite_difference():
    """acc_and_jerk's jerk equals d(acc)/dt along the actual velocities."""
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 10, (16, 3)))
    vel = jnp.asarray(rng.normal(0, 1, (16, 3)))
    mass = jnp.asarray(rng.uniform(1, 5, 16))
    G, eps = 0.5, 0.3
    acc, jerk = forces.acc_and_jerk(pos, mass, vel, G, eps)
    dt = 1e-6
    acc2 = forces.accelerations(pos + vel * dt, mass, G, eps)
    fd = (np.asarray(acc2) - np.asarray(acc)) / dt
    np.testing.assert_allclose(np.asarray(jerk), fd, rtol=1e-4, atol=1e-6)


def test_leapfrog_beats_euler():
    """Symplectic KDK conserves energy orders of magnitude better than
    explicit Euler at the same step size."""
    pos, vel, mass = _kepler_setup()
    G = 0.5

    def drift_of(method):
        def energy(s):
            return forces.kinetic_energy(s.vel, mass) + forces.potential_energy(
                s.pos, mass, G, 0.0
            )

        s = integrators.init_phase(pos, vel, _force_fn(mass, G, 0.0))
        e0 = float(energy(s))
        _, es = integrators.run(
            s, 0.05, 2000, _force_fn(mass, G, 0.0), method=method,
            diagnostics=lambda st: energy(st),
        )
        return np.max(np.abs(np.asarray(es) - e0) / abs(e0))

    assert drift_of("kdk") < 1e-2 * drift_of("euler")


def test_solar_system_drift():
    """Inner+outer solar system leapfrog energy bound (BASELINE config 2)."""
    sc = scene.solar_system()
    pos = jnp.asarray(sc["pos"], jnp.float64)
    vel = jnp.asarray(sc["vel"], jnp.float64)
    mass = jnp.asarray(sc["mass"], jnp.float64)
    G = 4 * np.pi**2
    f = _force_fn(mass, G, 0.0)

    def energy(s):
        return forces.kinetic_energy(s.vel, mass) + forces.potential_energy(
            s.pos, mass, G, 0.0
        )

    s = integrators.init_phase(pos, vel, f)
    e0 = float(energy(s))
    # 10 years at ~8.8 steps per Mercury orbit day: h = 1e-3 yr
    _, es = integrators.run(s, 1e-3, 10000, f, method="kdk", diagnostics=lambda st: energy(st))
    drift = np.max(np.abs(np.asarray(es) - e0) / abs(e0))
    assert drift < 1e-4, f"solar system energy drift {drift}"


def test_kdk_matches_reference_ordering():
    """One KDK step == the reference's half-kick/drift/force/half-kick with a
    hand-rolled NumPy transliteration (index.html:247-262), starting from
    acc=0 exactly like a fresh Body (index.html:217)."""
    rng = np.random.default_rng(3)
    n = 5
    pos = rng.normal(size=(n, 3))
    vel = rng.normal(size=(n, 3))
    mass = rng.uniform(1, 3, n)
    G, eps, h = 0.5, 0.5, 0.016

    # NumPy oracle step
    def np_acc(p):
        acc = np.zeros((n, 3))
        for i in range(n):
            for j in range(n):
                if i != j:
                    d = p[j] - p[i]
                    acc[i] += G / (d @ d + eps * eps) ** 1.5 * mass[j] * d
        return acc

    acc0 = np.zeros((n, 3))
    v = vel + acc0 * h / 2
    p = pos + v * h
    a = np_acc(p)
    v = v + a * h / 2

    f = _force_fn(jnp.asarray(mass), G, eps)
    s = integrators.init_phase(jnp.asarray(pos), jnp.asarray(vel))  # acc = 0
    s2 = integrators.kdk_step(s, h, f)
    np.testing.assert_allclose(np.asarray(s2.pos), p, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.vel), v, rtol=1e-12)


def test_dkd_and_symplectic_euler_conserve():
    """The ablation variants are symplectic too: bounded energy error on the
    Kepler problem (explicit Euler drifts monotonically by contrast)."""
    pos, vel, mass = _kepler_setup(e=0.2)
    G = 0.5
    f = _force_fn(mass, G, 0.0)

    def drift_of(method):
        def energy(s):
            return forces.kinetic_energy(s.vel, mass) + forces.potential_energy(
                s.pos, mass, G, 0.0
            )

        s = integrators.init_phase(pos, vel, f)
        e0 = float(energy(s))
        _, es = integrators.run(s, 0.02, 5000, f, method=method,
                                diagnostics=lambda st: energy(st))
        return np.max(np.abs(np.asarray(es) - e0) / abs(e0))

    assert drift_of("dkd") < 1e-4
    assert drift_of("symplectic_euler") < 5e-3  # first order, bounded
