"""Multi-host readiness: a TWO-PROCESS virtual CPU mesh (4 devices each)
coordinated by jax.distributed runs the sharded step and checkpoints /
restores shard-by-shard — the no-cluster stand-in for a DCN-spanning
deployment (SURVEY.md section 5 'distributed communication backend';
nbx.parallel.multihost)."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_step_and_checkpoint(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=repo,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            NBX_MH_CKPT=str(tmp_path / "mh_ckpt"),
            PYTHONUNBUFFERED="1",
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    deadline = time.time() + 540
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(5.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST OK" in out, out[-3000:]
    # the psum'd energy is replicated: both processes must agree exactly
    import re

    es = [re.search(r"E=(-?[\d.]+)", o).group(1) for o in outs]
    assert es[0] == es[1], es

    # and it must match a single-process 8-virtual-device run of the same
    # scene (the multi-host mesh changes topology, not physics)
    from nbx import forces, integrators
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 128
    pos = rng.normal(0, 10, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 1, (n, 3)).astype(np.float32)
    mass = rng.uniform(1, 5, n).astype(np.float32)
    f = lambda p: forces.accelerations_blocked(p, jnp.asarray(mass), 0.5, 0.5, 64)
    s = integrators.init_phase(jnp.asarray(pos), jnp.asarray(vel))
    for _ in range(3):
        s = integrators.kdk_step(s, 0.01, f)
    ke = float(forces.kinetic_energy(s.vel, jnp.asarray(mass)))
    pe = float(forces.potential_energy(s.pos, jnp.asarray(mass), 0.5, 0.5))
    np.testing.assert_allclose(float(es[0]), ke + pe, rtol=1e-4)
