"""State/slot-allocator property tests (reference addBody + Body ctor,
index.html:208-245): FIFO eviction at capacity, newborn acc=0, radius law."""

import jax
import jax.numpy as jnp
import numpy as np

from nbx.config import ICE, METAL, ROCK, SimConfig, body_radius, default_materials
from nbx.state import add_body, compact_arrays, empty_state


def _cfg(capacity=4):
    return SimConfig(capacity=capacity, collisions=True)


def test_add_fills_lowest_free_slot():
    cfg = _cfg()
    st = empty_state(cfg)
    st, ev = add_body(st, 1.0, jnp.zeros(3), jnp.zeros(3), ROCK)
    assert not bool(ev)
    assert bool(st.alive[0]) and not bool(st.alive[1])
    st, _ = add_body(st, 2.0, jnp.ones(3), jnp.zeros(3), ICE)
    assert bool(st.alive[1])
    assert int(st.n_alive) == 2


def test_fifo_eviction_at_capacity():
    """At maxBodies the OLDEST body is evicted (bodies.shift(),
    index.html:240-242)."""
    cfg = _cfg(capacity=3)
    st = empty_state(cfg)
    for k in range(3):
        st, ev = add_body(st, float(k + 1), jnp.full(3, float(k)), jnp.zeros(3), ROCK)
        assert not bool(ev)
    st, ev = add_body(st, 99.0, jnp.full(3, 9.0), jnp.zeros(3), METAL)
    assert bool(ev)
    assert int(st.n_alive) == 3
    # body with mass 1.0 (oldest) is gone; 99.0 occupies its slot
    masses = sorted(np.asarray(st.mass)[np.asarray(st.alive)].tolist())
    assert masses == [2.0, 3.0, 99.0]


def test_eviction_order_is_insertion_order():
    cfg = _cfg(capacity=2)
    st = empty_state(cfg)
    st, _ = add_body(st, 1.0, jnp.zeros(3), jnp.zeros(3), ROCK)
    st, _ = add_body(st, 2.0, jnp.zeros(3), jnp.zeros(3), ROCK)
    st, _ = add_body(st, 3.0, jnp.zeros(3), jnp.zeros(3), ROCK)  # evicts 1.0
    st, _ = add_body(st, 4.0, jnp.zeros(3), jnp.zeros(3), ROCK)  # evicts 2.0
    masses = sorted(np.asarray(st.mass)[np.asarray(st.alive)].tolist())
    assert masses == [3.0, 4.0]


def test_newborn_acc_is_zero():
    cfg = _cfg()
    st = empty_state(cfg)
    st = st.replace(acc=jnp.ones_like(st.acc))
    st, _ = add_body(st, 1.0, jnp.zeros(3), jnp.zeros(3), ROCK)
    np.testing.assert_allclose(np.asarray(st.acc[0]), 0.0)


def test_contact_cleared_on_slot_reuse():
    cfg = _cfg(capacity=2)
    st = empty_state(cfg)
    st, _ = add_body(st, 1.0, jnp.zeros(3), jnp.zeros(3), ROCK)
    st, _ = add_body(st, 2.0, jnp.zeros(3), jnp.zeros(3), ROCK)
    st = st.replace(contact=jnp.full((2, 2), 7.0))
    st, _ = add_body(st, 3.0, jnp.zeros(3), jnp.zeros(3), ROCK)  # reuses slot 0
    c = np.asarray(st.contact)
    assert (c[0, :] == 0).all() and (c[:, 0] == 0).all()


def test_radius_law():
    """r = (3m / 4 pi rho)^(1/3) with rock=1.0, metal=3.0, ice=0.5 densities
    (index.html:71-73, 221)."""
    mats = default_materials()
    m = jnp.asarray(100.0)
    for code, rho in [(ROCK, 1.0), (METAL, 3.0), (ICE, 0.5)]:
        r = float(body_radius(m, jnp.asarray(code), mats))
        np.testing.assert_allclose(r, (3 * 100 / (4 * np.pi * rho)) ** (1 / 3), rtol=1e-6)


def test_compact_arrays_orders_by_insertion():
    cfg = _cfg(capacity=3)
    st = empty_state(cfg)
    for k in range(3):
        st, _ = add_body(st, float(k + 1), jnp.zeros(3), jnp.zeros(3), ROCK)
    st, _ = add_body(st, 4.0, jnp.zeros(3), jnp.zeros(3), ROCK)  # evict oldest
    view = compact_arrays(st)
    assert view["mass"].tolist() == [2.0, 3.0, 4.0]
