"""Multi-chip scaling: bodies sharded over a device mesh.

The reference is a single browser tab with zero parallelism (SURVEY.md
section 2b); this module is the scaling story the TPU build adds (BASELINE
config 5: N = 1M galaxy merger on v5p-8).

Design (the all-gather strategy from the scaling playbook):

  * 1D mesh axis "b": each chip owns N/D bodies (pos, vel, mass shards).
  * Per KDK substep, every chip `lax.all_gather`s the drifted positions and
    masses over ICI (tiled), then computes the force of ALL bodies on its
    LOCAL shard with the rectangular Pallas kernel — O(N^2/D) flops/chip,
    O(N) comm/chip per step.
  * Optional 2D mesh ("b", "j"): the source axis is also sharded, each chip
    computes a partial force over its source slice and a `psum` over "j"
    completes the reduction — halves the gather volume per chip when the
    per-chip N shard no longer amortizes the all-gather.
  * Diagnostics (energy/momentum) are psum-reduced on device.

Everything is `shard_map` over a `jax.sharding.Mesh`, so the same code runs
on a real multi-chip slice or on N virtual CPU devices
(--xla_force_host_platform_device_count) in the test suite.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



def make_mesh(n_devices: int | None = None, axes=("b",)) -> Mesh:
    """1D (or factored 2D) device mesh. n_devices defaults to all."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 1:
        return jax.make_mesh((n,), axes, devices=devs)
    assert len(axes) == 2
    # Factor n into a near-square 2D mesh
    a = int(n**0.5)
    while n % a:
        a -= 1
    return jax.make_mesh((a, n // a), axes, devices=devs)


class ShardedState(NamedTuple):
    """Gravity-only phase state, body axis sharded over the mesh."""

    pos: jax.Array  # [N, 3]
    vel: jax.Array  # [N, 3]
    acc: jax.Array  # [N, 3]
    mass: jax.Array  # [N]


def shard_state(mesh: Mesh, pos, vel, mass) -> ShardedState:
    """Place arrays on the mesh, body axis sharded. N must divide evenly
    (pad with mass-0 bodies otherwise — they exert zero force)."""
    n = pos.shape[0]
    d = mesh.devices.size
    if n % d:
        raise ValueError(f"N={n} not divisible by mesh size {d}; pad with mass-0")
    s3 = NamedSharding(mesh, P("b", None))
    s1 = NamedSharding(mesh, P("b"))
    pos = jax.device_put(jnp.asarray(pos, jnp.float32), s3)
    vel = jax.device_put(jnp.asarray(vel, jnp.float32), s3)
    mass = jax.device_put(jnp.asarray(mass, jnp.float32), s1)
    acc = jnp.zeros_like(pos)  # reference newborn acc=0 (index.html:217)
    return ShardedState(pos, vel, acc, mass)


def shard_state2d(mesh: Mesh, pos, vel, mass) -> ShardedState:
    """2D-mesh placement: body axis sharded over both mesh axes ("b" major,
    "j" minor) — the layout make_sharded_step_2d expects."""
    n = pos.shape[0]
    d = mesh.devices.size
    if n % d:
        raise ValueError(f"N={n} not divisible by mesh size {d}; pad with mass-0")
    s3 = NamedSharding(mesh, P(("b", "j"), None))
    s1 = NamedSharding(mesh, P(("b", "j")))
    pos = jax.device_put(jnp.asarray(pos, jnp.float32), s3)
    vel = jax.device_put(jnp.asarray(vel, jnp.float32), s3)
    mass = jax.device_put(jnp.asarray(mass, jnp.float32), s1)
    return ShardedState(pos, vel, jnp.zeros_like(pos), mass)


def _local_acc(pos_all, mass_all, pos_local, G, eps, impl: str):
    """Force of all bodies on the local shard (rectangular problem)."""
    if impl == "pallas":
        from nbx.ops.pairwise import pairwise_acc

        return pairwise_acc(pos_all, mass_all, G, eps, target_pos=pos_local)
    # jnp fallback (tests on CPU): dense rectangular
    d = pos_all[None, :, :] - pos_local[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, pos_all.dtype) ** 2
    safe = jnp.where(r2 > 0, r2, 1.0)
    f = G * jax.lax.rsqrt(safe) / safe
    w = jnp.where(r2 > 0, f * mass_all[None, :], 0.0)
    return jnp.einsum("ij,ijc->ic", w, d)


def make_sharded_step(mesh: Mesh, impl: str = "auto"):
    """Build the sharded KDK substep: (state, G, eps, h) -> state.

    Same integration semantics as the single-chip gravity path
    (nbx.integrators.kdk_step, reference index.html:247-262, collisions off).
    """
    impl = _resolve_impl(impl)

    @jax.jit
    def step(state: ShardedState, G, eps, h) -> ShardedState:
        def local(pos, vel, acc, mass):
            vel = vel + acc * (0.5 * h)
            pos = pos + vel * h
            pos_all = jax.lax.all_gather(pos, "b", axis=0, tiled=True)
            mass_all = jax.lax.all_gather(mass, "b", axis=0, tiled=True)
            acc = _local_acc(pos_all, mass_all, pos, G, eps, impl)
            vel = vel + acc * (0.5 * h)
            return pos, vel, acc

        pos, vel, acc = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("b", None), P("b", None), P("b", None), P("b")),
            out_specs=(P("b", None), P("b", None), P("b", None)),
        )(state.pos, state.vel, state.acc, state.mass)
        return ShardedState(pos, vel, acc, state.mass)

    return step


def make_sharded_step_2d(mesh: Mesh, impl: str = "auto"):
    """2D-mesh variant: bodies sharded over "b", sources over "j".

    Each chip gathers positions only over its "b" row (1/|j| of the full
    gather volume), computes the partial force of its source slice on its
    body shard, and a psum over "j" completes the Newton sum — the
    tensor-parallel analog for the force reduction.
    """
    impl = _resolve_impl(impl)

    @jax.jit
    def step(state: ShardedState, G, eps, h) -> ShardedState:
        def local(pos, vel, acc, mass):
            # pos/vel/acc: [N/(b*j), 3] — body axis sharded over BOTH mesh
            # axes so that drift/kick work and memory are fully distributed.
            vel = vel + acc * (0.5 * h)
            pos = pos + vel * h
            # Re-assemble the "b"-row body shard: gather over "j".
            pos_b = jax.lax.all_gather(pos, "j", axis=0, tiled=True)
            # Source slice for this chip's "j" column: gather over "b"
            # (a strided 1/|j| subset of all bodies; the j columns partition
            # the sources, and the force sum is order-invariant).
            src_pos = jax.lax.all_gather(pos, "b", axis=0, tiled=True)
            src_mass = jax.lax.all_gather(mass, "b", axis=0, tiled=True)
            partial = _local_acc(src_pos, src_mass, pos_b, G, eps, impl)
            # Complete the source reduction and scatter back to the local
            # body sub-shard in one collective: chunk j of the "b"-row is
            # exactly this device's sub-shard under P(("b", "j")) layout.
            acc_full = jax.lax.psum_scatter(
                partial, "j", scatter_dimension=0, tiled=True
            )
            vel = vel + acc_full * (0.5 * h)
            return pos, vel, acc_full

        pos, vel, acc = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(("b", "j"), None),) * 3 + (P(("b", "j")),),
            out_specs=(P(("b", "j"), None),) * 3,
        )(state.pos, state.vel, state.acc, state.mass)
        return ShardedState(pos, vel, acc, state.mass)

    return step


def make_sharded_step_ring(mesh: Mesh, impl: str = "auto"):
    """Ring-systolic variant of the sharded KDK substep.

    Instead of one all-gather of every position (peak comm buffer = N), the
    source chunk rotates around the ring with `lax.ppermute`: D-1 hops of
    N/D positions+masses each, with the local force partial computed between
    hops — XLA overlaps the async permute with the force kernel on real ICI
    (the systolic N-body pattern; same total bytes as the all-gather but
    O(N/D) peak buffer and compute/comm overlap instead of a serial
    gather-then-compute).

    Bit-matches the physics of make_sharded_step up to f32 summation order
    (chunk-major instead of source-major accumulation).
    """
    impl = _resolve_impl(impl)

    @jax.jit
    def step(state: ShardedState, G, eps, h) -> ShardedState:
        def local(pos, vel, acc, mass):
            d = jax.lax.axis_size("b")
            vel = vel + acc * (0.5 * h)
            pos = pos + vel * h

            perm = [(i, (i + 1) % d) for i in range(d)]

            def hop(k, carry):
                acc_sum, src_pos, src_mass = carry
                acc_sum = acc_sum + _local_acc(
                    src_pos, src_mass, pos, G, eps, impl
                )
                # rotate sources to the next chip (a no-op result on the
                # final iteration is avoided by bounding the loop at d - 1
                # hops and adding the last chunk's force outside)
                src_pos = jax.lax.ppermute(src_pos, "b", perm)
                src_mass = jax.lax.ppermute(src_mass, "b", perm)
                return acc_sum, src_pos, src_mass

            acc0 = jnp.zeros_like(pos)
            acc_sum, src_pos, src_mass = jax.lax.fori_loop(
                0, d - 1, hop, (acc0, pos, mass)
            )
            acc = acc_sum + _local_acc(src_pos, src_mass, pos, G, eps, impl)
            vel = vel + acc * (0.5 * h)
            return pos, vel, acc

        pos, vel, acc = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("b", None), P("b", None), P("b", None), P("b")),
            out_specs=(P("b", None), P("b", None), P("b", None)),
        )(state.pos, state.vel, state.acc, state.mass)
        return ShardedState(pos, vel, acc, state.mass)

    return step


def run_sharded(
    state: ShardedState,
    step_fn,
    G,
    eps,
    h,
    n_steps: int,
    diag_every: int = 0,
    mesh: Mesh | None = None,
    impl: str = "auto",
):
    """Scan n_steps of the sharded substep in one dispatch.

    Returns (state, energies): `energies` is a [n_steps // diag_every, 2]
    array of psum-reduced (KE, PE) samples when diag_every > 0 (requires
    `mesh`), else None.
    """
    def body(st, _):
        return step_fn(st, G, eps, h), None

    if diag_every > 0:
        if mesh is None:
            raise ValueError("diag_every > 0 requires the mesh for psum diagnostics")
        chunks = n_steps // diag_every

        def chunk(st, _):
            # inner scan keeps the traced program size independent of
            # diag_every (a python loop would inline diag_every step copies)
            st, _ = jax.lax.scan(body, st, None, length=diag_every)
            ke, pe = _sharded_energy_jit(mesh, st, G, eps, _resolve_impl(impl))
            return st, jnp.stack([ke, pe])

        state, energies = jax.lax.scan(chunk, state, None, length=chunks)
        remainder = n_steps - chunks * diag_every
        if remainder:
            state, _ = jax.lax.scan(body, state, None, length=remainder)
        return state, energies

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state, None


def _resolve_impl(impl: str) -> str:
    return ("pallas" if jax.default_backend() == "tpu" else "jnp") if impl == "auto" else impl


@functools.partial(jax.jit, static_argnames=("mesh", "width", "height"))
def render_sharded(
    mesh: Mesh,
    state: ShardedState,
    cam,
    radius_scale: float = 0.8,
    width: int = 640,
    height: int = 360,
    exposure: float = 4.0,
):
    """Device-side rendering of a sharded state: every chip splats its LOCAL
    body shard into an HDR framebuffer, one psum over the mesh composites the
    additive image, tonemap replicates — the interactive-render story for the
    N=1M multi-chip configuration (BASELINE config 5). Readback ships one
    [H, W, 3] image regardless of N."""
    from nbx.config import default_materials
    from nbx.render.colormap import tonemap
    from nbx.render.splat import splat_bodies_hdr

    mats = default_materials()

    def local(pos, mass):
        n_loc = pos.shape[0]
        radius = jnp.cbrt(mass) * radius_scale
        hdr = splat_bodies_hdr(
            pos,
            radius,
            jnp.zeros((n_loc,)),
            jnp.zeros((n_loc,), jnp.int32),
            jnp.ones((n_loc,), bool),
            mats.color1,
            mats.color2,
            cam,
            width=width,
            height=height,
        )
        return tonemap(jax.lax.psum(hdr, "b"), exposure)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("b", None), P("b")),
        out_specs=P(),
    )(state.pos, state.mass)


def sharded_energy(mesh: Mesh, state: ShardedState, G, eps, impl: str = "auto"):
    """Total (KE, PE) computed on device with psum reduction."""
    return _sharded_energy_jit(mesh, state, G, eps, _resolve_impl(impl))


@functools.partial(jax.jit, static_argnames=("mesh", "impl"))
def _sharded_energy_jit(mesh: Mesh, state: ShardedState, G, eps, impl: str):
    def local(pos, vel, mass):
        ke = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))
        pos_all = jax.lax.all_gather(pos, "b", axis=0, tiled=True)
        mass_all = jax.lax.all_gather(mass, "b", axis=0, tiled=True)
        if impl == "pallas":
            from nbx.ops.pairwise import potential_per_body

            phi = potential_per_body(
                pos_all, mass_all, G, eps, target_pos=pos, target_mass=mass
            )
        else:
            d = pos_all[None, :, :] - pos[:, None, :]
            r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, jnp.float32) ** 2
            inv = jax.lax.rsqrt(r2)
            phi = -G * jnp.sum(mass_all[None, :] * inv, axis=1) + G * mass / eps
        pe = 0.5 * jnp.sum(mass * phi)
        # psum makes the scalars identical on every device -> replicated out
        return jax.lax.psum(ke, "b"), jax.lax.psum(pe, "b")

    ke, pe = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("b", None), P("b", None), P("b")),
        out_specs=(P(), P()),
    )(state.pos, state.vel, state.mass)
    return ke, pe  # noqa: E501
