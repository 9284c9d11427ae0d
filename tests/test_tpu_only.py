"""Compiled-Mosaic kernel tests — run ONLY on a real TPU:

    NBX_TEST_TPU=1 python -m pytest tests/test_tpu_only.py -q

The regular suite exercises the Pallas kernels in interpret mode (CPU
semantics); interpret mode does NOT reproduce Mosaic's compiled numerics
(e.g. the one-pass-bf16 default matmul), so these gates exist to catch
on-chip regressions. They are skipped on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU"
)


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 20, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 5, n), jnp.float32)
    return pos, mass


def test_compiled_f32r_accuracy():
    from nbx import forces
    from nbx.ops.pairwise import pairwise_acc

    pos, mass = _rand(4096)
    want = forces.accelerations_blocked(pos, mass, 0.5, 0.5, 1024)
    got = pairwise_acc(pos, mass, 0.5, 0.5)
    err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert err < 1e-5, f"compiled f32r error {err}"


def test_compiled_variants_error_ladder():
    from nbx import forces
    from nbx.ops.pairwise import pairwise_acc

    pos, mass = _rand(2048, seed=1)
    want = forces.accelerations_blocked(pos, mass, 0.5, 0.5, 1024)
    scale = float(jnp.abs(want).max())

    def err(prec, ti=512, tj=2048):
        got = pairwise_acc(pos, mass, 0.5, 0.5, tile_i=ti, tile_j=tj,
                           precision=prec)
        return float(jnp.abs(got - want).max()) / scale

    assert err("f32r") < 1e-5
    assert err("f32") < 1e-3
    # study variants at their known-good tiling (Mosaic rejects the bf16
    # 3-pass matmul at some single-j-tile shapes)
    assert err("fast", 256, 1024) < 1e-2
    assert err("bf16", 256, 1024) < 5e-2


def test_compiled_potential():
    from nbx import forces
    from nbx.ops.pairwise import potential_energy

    pos, mass = _rand(2048, seed=2)
    want = float(forces.potential_energy(pos, mass, 0.5, 0.5, block=1024))
    got = float(potential_energy(pos, mass, 0.5, 0.5))
    assert abs(got - want) / abs(want) < 1e-5


def test_compiled_rectangular_shard_path():
    from nbx import forces
    from nbx.ops.pairwise import pairwise_acc

    pos, mass = _rand(2048, seed=3)
    tgt = pos[256:512]
    want = forces.accelerations_blocked(pos, mass, 0.5, 0.5, 1024)[256:512]
    got = pairwise_acc(pos, mass, 0.5, 0.5, target_pos=tgt)
    err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert err < 1e-5
