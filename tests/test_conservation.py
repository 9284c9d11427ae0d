"""Conservation gates and determinism (SURVEY.md section 4, items 3 and 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from nbx import diagnostics, scene, sim
from nbx.config import SimConfig
from nbx.state import compact_arrays


def test_momentum_and_angular_momentum_gravity_only():
    """With merge/fracture disabled, linear AND angular momentum are
    conserved to f32 roundoff over a long run."""
    cfg = SimConfig(capacity=64, collisions=False)
    st = scene.make_state(cfg, scene.reference_galaxy(n_disk=40, seed=4))
    d0 = diagnostics.measure(st, cfg)
    st, _ = sim.run(st, cfg, 300)
    d1 = diagnostics.measure(st, cfg)
    p_scale = float(jnp.sum(st.mass * jnp.linalg.norm(st.vel, axis=1)))
    np.testing.assert_allclose(
        np.asarray(d1.momentum), np.asarray(d0.momentum), atol=2e-4 * p_scale
    )
    l_scale = float(
        jnp.sum(st.mass * jnp.linalg.norm(jnp.cross(st.pos, st.vel), axis=1))
    )
    np.testing.assert_allclose(
        np.asarray(d1.angular_momentum),
        np.asarray(d0.angular_momentum),
        atol=2e-4 * l_scale,
    )


def test_fracture_deterministic_by_key():
    """Same PRNG key -> identical fracture outcomes; different key ->
    different fragments. The reference cannot do this (Math.random,
    index.html:418-433)."""
    cfg = SimConfig(capacity=64, G=0.0, fracture_threshold=0.5, merge_time=1e9)
    sc = scene.head_on_collision()
    sc["vel"][:, 0] = [20.0, -20.0]
    sc["pos"][:, 0] = [-3, 3]
    sc["pos"][:, 2] = [0, 0]

    def run_with_key(key):
        st = scene.make_state(cfg, sc, key=key)
        for _ in range(10):
            st, _ = sim.step(st, cfg)
        return compact_arrays(st)

    a = run_with_key(7)
    b = run_with_key(7)
    c = run_with_key(8)
    assert len(a["mass"]) > 2  # fractured
    np.testing.assert_array_equal(a["pos"], b["pos"])
    np.testing.assert_array_equal(a["mass"], b["mass"])
    assert (len(a["mass"]) != len(c["mass"])) or not np.allclose(
        a["pos"], c["pos"]
    )


def test_compensated_integration_reduces_drift():
    """Kahan-compensated KDK beats plain KDK on long f32 runs (or at least
    never does worse) — the integrator-level version of the drift-gate
    machinery."""
    from nbx import forces, integrators

    sc = scene.kepler_two_body(e=0.3)
    pos = jnp.asarray(sc["pos"])
    vel = jnp.asarray(sc["vel"])
    mass = jnp.asarray(sc["mass"])
    f = lambda p: forces.accelerations(p, mass, 0.5, 0.0)

    def drift(compensated):
        def energy(s):
            return forces.kinetic_energy(s.vel, mass) + forces.potential_energy(
                s.pos, mass, 0.5, 0.0
            )

        s = integrators.init_phase(pos, vel, f)
        e0 = float(energy(s))
        _, es = integrators.run(
            s, 0.02, 20000, f, diagnostics=lambda st: energy(st),
            compensated=compensated,
        )
        return float(np.abs(np.asarray(es) - e0).max() / abs(e0))

    d_plain = drift(False)
    d_kahan = drift(True)
    assert d_kahan <= d_plain * 1.05, (d_kahan, d_plain)
    assert d_kahan < 5e-4
