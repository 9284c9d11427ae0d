"""Fixed-capacity structure-of-arrays simulation state.

The reference stores bodies as a dynamic JS array of `Body` objects with
THREE.Vector3 fields (index.html:208-231, 233-245). XLA needs static shapes,
so nbx uses a fixed-capacity SoA pytree resident in HBM with an `alive` mask:

  - births take the lowest-index free slot (reference appends, index.html:243)
  - when full, the oldest body (min insertion seq) is evicted — the FIFO
    `shift()` of index.html:240-242
  - deaths clear the slot (mass -> 0 so the body stops exerting gravity).

Dead slots have mass 0, so they contribute exactly zero force in the pairwise
kernels with no extra masking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .config import SimConfig, body_radius


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimState:
    """State pytree. C = capacity (static).

    contact[i, j] holds accumulated contact seconds for the overlapping pair
    (i, j), i < j — the reference's `contactPairs: Map<pairId, seconds>`
    (index.html:236, 314-319). `None` when collisions are disabled (large-N
    gravity-only runs don't pay O(C^2) memory).
    """

    pos: jax.Array  # [C, 3] f32
    vel: jax.Array  # [C, 3] f32
    acc: jax.Array  # [C, 3] f32 — zero for newborn bodies (index.html:217)
    mass: jax.Array  # [C] f32, 0 for dead slots
    temp: jax.Array  # [C] f32 (index.html:223)
    mat: jax.Array  # [C] i32 material code
    alive: jax.Array  # [C] bool
    seq: jax.Array  # [C] i32 insertion order, drives FIFO eviction
    next_seq: jax.Array  # [] i32
    step_count: jax.Array  # [] i32
    key: jax.Array  # PRNG key
    contact: Optional[jax.Array] = None  # [C, C] f32 or None

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def radius(self, cfg: SimConfig) -> jax.Array:
        return body_radius(self.mass, self.mat, cfg.materials)

    def replace(self, **kwargs) -> "SimState":
        return dataclasses.replace(self, **kwargs)


def empty_state(cfg: SimConfig, key: jax.Array | int = 0) -> SimState:
    """All-dead state at full capacity."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    c = cfg.capacity
    f3 = jnp.zeros((c, 3), jnp.float32)
    f1 = jnp.zeros((c,), jnp.float32)
    return SimState(
        pos=f3,
        vel=f3,
        acc=f3,
        mass=f1,
        temp=f1,
        mat=jnp.zeros((c,), jnp.int32),
        alive=jnp.zeros((c,), bool),
        seq=jnp.zeros((c,), jnp.int32),
        next_seq=jnp.asarray(0, jnp.int32),
        step_count=jnp.asarray(0, jnp.int32),
        key=key,
        contact=jnp.zeros((c, c), jnp.float32) if cfg.collisions else None,
    )


def _clear_contact_slot(contact: Optional[jax.Array], slot: jax.Array):
    if contact is None:
        return None
    contact = contact.at[slot, :].set(0.0)
    return contact.at[:, slot].set(0.0)


def allocate_slot(state: SimState) -> tuple[SimState, jax.Array, jax.Array]:
    """Pick a slot for a new body; evict the oldest body if full.

    Returns (state_with_slot_freed, slot_index, evicted_flag). Reproduces the
    FIFO `bodies.shift()` policy of index.html:240-242: the evicted body is
    the alive body with the smallest insertion seq.
    """
    c = state.capacity
    any_free = jnp.any(~state.alive)
    # Lowest-index free slot (newborns fill 0,1,2,... like JS array append).
    free_slot = jnp.argmax(~state.alive)
    # Oldest body: min seq among alive.
    big = jnp.iinfo(jnp.int32).max
    oldest = jnp.argmin(jnp.where(state.alive, state.seq, big))
    slot = jnp.where(any_free, free_slot, oldest).astype(jnp.int32)
    evicted = ~any_free
    return state, slot, evicted


def add_body(
    state: SimState,
    mass: jax.Array,
    pos: jax.Array,
    vel: jax.Array,
    mat: jax.Array | int,
    temp: jax.Array | float = 0.0,
) -> tuple[SimState, jax.Array]:
    """Insert one body (jit-safe). Returns (new_state, evicted_flag).

    Mirrors PhysicsSystem.addBody + the Body ctor (index.html:208-245):
    newborn acc = 0 (index.html:217), FIFO eviction at capacity.
    """
    state, slot, evicted = allocate_slot(state)
    return (
        state.replace(
            pos=state.pos.at[slot].set(jnp.asarray(pos, jnp.float32)),
            vel=state.vel.at[slot].set(jnp.asarray(vel, jnp.float32)),
            acc=state.acc.at[slot].set(0.0),
            mass=state.mass.at[slot].set(jnp.asarray(mass, jnp.float32)),
            temp=state.temp.at[slot].set(jnp.asarray(temp, jnp.float32)),
            mat=state.mat.at[slot].set(jnp.asarray(mat, jnp.int32)),
            alive=state.alive.at[slot].set(True),
            seq=state.seq.at[slot].set(state.next_seq),
            next_seq=state.next_seq + 1,
            contact=_clear_contact_slot(state.contact, slot),
        ),
        evicted,
    )


def add_bodies_batch(
    state: SimState,
    mass: jax.Array,  # [B]
    pos: jax.Array,  # [B, 3]
    vel: jax.Array,  # [B, 3]
    mat: jax.Array,  # [B] i32
    temp: jax.Array,  # [B]
    mask: jax.Array,  # [B] bool — invalid births are skipped
) -> tuple[SimState, jax.Array]:
    """Insert up to B bodies in one vectorized pass (jit-safe).

    Semantically equivalent to B sequential add_body calls (the reference's
    newBodies loop, index.html:387-389): the k-th valid birth takes the k-th
    slot in allocation priority order — free slots by ascending index first
    (JS array append), then alive slots by ascending insertion seq (FIFO
    `shift()` eviction, index.html:240-242). One lexsort + scatters instead
    of a B-iteration fori_loop of argmax/scatter chains (~10x faster
    collision substep at default event buffer sizes).

    Requires B <= capacity (newborns never evict same-batch newborns; the
    default capacity 300 >= max_births 160). Returns (state, n_evicted).
    """
    c = state.capacity
    b = mask.shape[0]
    slot_idx = jnp.arange(c, dtype=jnp.int32)
    # allocation priority: (alive asc, then slot for free / seq for alive)
    order = jnp.lexsort((jnp.where(state.alive, state.seq, slot_idx), state.alive))
    order = order.astype(jnp.int32)
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1  # [B] compacted position
    mask = mask & (rank < c)  # births beyond capacity are dropped, not aliased
    slot = jnp.where(mask, order[jnp.clip(rank, 0, c - 1)], c)  # c = dropped
    n_valid = jnp.sum(mask.astype(jnp.int32))
    n_free = jnp.sum((~state.alive).astype(jnp.int32))
    n_evicted = jnp.maximum(n_valid - n_free, 0)

    seq_new = state.next_seq + rank
    contact = state.contact
    if contact is not None:
        keep = jnp.ones((c,), bool).at[slot].set(False, mode="drop")
        contact = jnp.where(keep[:, None] & keep[None, :], contact, 0.0)
    return (
        state.replace(
            pos=state.pos.at[slot].set(jnp.asarray(pos, jnp.float32), mode="drop"),
            vel=state.vel.at[slot].set(jnp.asarray(vel, jnp.float32), mode="drop"),
            acc=state.acc.at[slot].set(0.0, mode="drop"),
            mass=state.mass.at[slot].set(jnp.asarray(mass, jnp.float32), mode="drop"),
            temp=state.temp.at[slot].set(jnp.asarray(temp, jnp.float32), mode="drop"),
            mat=state.mat.at[slot].set(jnp.asarray(mat, jnp.int32), mode="drop"),
            alive=state.alive.at[slot].set(True, mode="drop"),
            seq=state.seq.at[slot].set(seq_new, mode="drop"),
            next_seq=state.next_seq + n_valid,
            contact=contact,
        ),
        n_evicted,
    )


def add_bodies(
    state: SimState,
    mass: jax.Array,
    pos: jax.Array,
    vel: jax.Array,
    mat: jax.Array,
    temp: Optional[jax.Array] = None,
) -> SimState:
    """Bulk insert n bodies (host-side convenience for scenario setup).

    Assumes the state has >= n free slots (scenario builders start empty).
    """
    n = mass.shape[0]
    if temp is None:
        temp = jnp.zeros((n,), jnp.float32)

    def body_fn(i, s):
        s, _ = add_body(s, mass[i], pos[i], vel[i], mat[i], temp[i])
        return s

    return jax.lax.fori_loop(0, n, body_fn, state)


def compact_arrays(state: SimState) -> dict:
    """Host-side: gather alive bodies in insertion (seq) order as numpy-ish
    arrays — the render/inspection view of the dynamic body list."""
    import numpy as np

    alive = np.asarray(state.alive)
    order = np.argsort(np.asarray(state.seq)[alive], kind="stable")
    idx = np.nonzero(alive)[0][order]
    return dict(
        pos=np.asarray(state.pos)[idx],
        vel=np.asarray(state.vel)[idx],
        mass=np.asarray(state.mass)[idx],
        temp=np.asarray(state.temp)[idx],
        mat=np.asarray(state.mat)[idx],
        seq=np.asarray(state.seq)[idx],
        slot=idx,
    )
