"""Multi-host (multi-process) mesh construction + global state placement.

The reference is a single browser tab (SURVEY.md section 2b); within one
slice nbx scales over ICI via `nbx.parallel.shard`. This module adds the
DCN axis: several HOSTS, each owning a subset of devices, cooperating
through `jax.distributed` — BASELINE config 5 grown past one slice, and
the "distributed communication backend" row of SURVEY section 5.

Design (the standard JAX multi-controller model — every process runs the
SAME program):

  * `initialize()` wraps jax.distributed.initialize (coordinator, process
    count, process id — from args or the standard env vars). After it,
    `jax.devices()` is the GLOBAL device list.
  * `make_host_mesh()` builds the body-axis mesh over all global devices,
    ordered so that each host's devices are CONTIGUOUS along the axis:
    the per-step all-gather then moves each chip's shard over ICI within
    the host/slice first and crosses DCN once per host boundary (the
    hybrid-mesh recipe of mesh_utils.create_hybrid_device_mesh, reduced
    to 1D). shard_map code from nbx.parallel.shard runs UNCHANGED on the
    result — collectives are topology-agnostic by construction.
  * `shard_state_multihost(mesh, pos, vel, mass)` places GLOBAL arrays
    from per-host numpy slices (jax.make_array_from_process_local_data):
    no host ever materializes the whole state — the multi-host analog of
    shard.shard_state.
  * checkpoints: nbx.checkpoint.save_sharded_orbax already writes
    jax.Arrays shard-by-shard and orbax is multi-host aware (each process
    writes only its own shards; restore reshards onto the live mesh).

Tested without real multi-host hardware by spawning two coordinated CPU
processes (4 virtual devices each) against a localhost coordinator —
tests/test_multihost.py, the same pattern the driver's virtual-mesh dryrun
uses for single-process multi-device.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Start the jax.distributed runtime (idempotent; no-op when already
    initialized). Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) so
    launchers can configure processes uniformly."""
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes
        if num_processes is not None
        else int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def make_host_mesh(axis: str = "b") -> Mesh:
    """1D mesh over ALL global devices, host-major order: devices of the
    same process sit contiguously on the axis, so neighbor exchanges and
    the gather's ring schedule ride ICI within a host and cross DCN only
    at host boundaries."""
    devs = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    return Mesh(np.asarray(devs), (axis,))


def shard_state_multihost(mesh: Mesh, pos, vel, mass):
    """Build a gravity-phase ShardedState from PER-HOST data slices.

    Each process passes only ITS slice of the body axis (the rows for its
    own devices, host-major mesh order); jax.make_array_from_process_local_data
    assembles the global jax.Arrays without any host seeing the full
    state. Shapes must divide evenly over the mesh (pad with mass-0
    bodies — they exert zero force)."""
    from nbx.parallel.shard import ShardedState

    import jax.numpy as jnp

    n_local = pos.shape[0]
    n_global = n_local * jax.process_count()
    s3 = NamedSharding(mesh, P("b", None))
    s1 = NamedSharding(mesh, P("b"))
    mk3 = lambda x: jax.make_array_from_process_local_data(
        s3, np.asarray(x, np.float32), (n_global, 3)
    )
    mk1 = lambda x: jax.make_array_from_process_local_data(
        s1, np.asarray(x, np.float32), (n_global,)
    )
    pos_g = mk3(pos)
    return ShardedState(
        pos=pos_g,
        vel=mk3(vel),
        acc=jnp.zeros_like(pos_g),  # newborn acc = 0 (index.html:217)
        mass=mk1(mass),
    )
