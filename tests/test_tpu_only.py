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


def test_compiled_collision_kernel_matches_interpret():
    """The fused binned-collision kernel's compiled Mosaic output must match
    interpret mode (measured bit-exact on v5e round 2)."""
    from nbx.config import body_radius, default_materials
    from nbx.ops.collide import binned_collision_pass

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(20, 50, (96, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (96, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(5.0, 20.0, 96), jnp.float32)
    radius = body_radius(mass, jnp.zeros(96, jnp.int32), default_materials())
    out_c = binned_collision_pass(pos, vel, mass, radius, 100.0, 8,
                                  max_per_cell=64, interpret=False)
    out_i = binned_collision_pass(pos, vel, mass, radius, 100.0, 8,
                                  max_per_cell=64, interpret=True)
    for c, i, name in ((out_c[0], out_i[0], "dvel"),
                       (out_c[1], out_i[1], "dpos"),
                       (out_c[2], out_i[2], "dtemp")):
        err = float(jnp.abs(c - i).max()) / (float(jnp.abs(i).max()) + 1e-12)
        assert err < 1e-5, (name, err)
    assert (np.asarray(out_c[3]["j"]) == np.asarray(out_i[3]["j"])).all()
    assert int(out_c[4]) == int(out_i[4])  # bounce counts


def test_compiled_packed_collision_matches_interpret():
    """Band-PACKED layout: compiled Mosaic output vs interpret mode (same
    gate as the banded kernel; the kernel body is identical, only the
    block construction differs)."""
    from nbx.config import body_radius, default_materials
    from nbx.ops.collide import binned_collision_pass

    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(10, 90, (512, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (512, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(5.0, 20.0, 512), jnp.float32)
    radius = body_radius(mass, jnp.zeros(512, jnp.int32),
                         default_materials()) * 2.0
    outs = {}
    for interp in (False, True):
        outs[interp] = binned_collision_pass(
            pos, vel, mass, radius, 100.0, 8, band_cells=3,
            packed_caps=(64, 96), interpret=interp)
    out_c, out_i = outs[False], outs[True]
    assert int(out_c[5]) == int(out_i[5]) == 0  # no window overflow
    for c, i, name in ((out_c[0], out_i[0], "dvel"),
                       (out_c[1], out_i[1], "dpos"),
                       (out_c[2], out_i[2], "dtemp")):
        err = float(jnp.abs(c - i).max()) / (float(jnp.abs(i).max()) + 1e-12)
        assert err < 1e-5, (name, err)
    assert (np.asarray(out_c[3]["j"]) == np.asarray(out_i[3]["j"])).all()
    assert int(out_c[4]) == int(out_i[4]) > 0  # bounce counts


def test_compiled_mxu_variant_error():
    """MXU-r^2 prototype: looser gate (r^2 cancellation + bf16 split self
    term; see docs/RESULTS.md round-2 'kernel headroom' numbers)."""
    from nbx import forces
    from nbx.ops.pairwise import pairwise_acc

    pos, mass = _rand(2048, seed=4)
    want = forces.accelerations_blocked(pos, mass, 0.5, 0.5, 1024)
    got = pairwise_acc(pos, mass, 0.5, 0.5, precision="mxu")
    err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert err < 2e-2, f"compiled mxu error {err}"


def test_compiled_local_slab_kernel_matches_interpret():
    """packed_collision_blocks_local (the halo-exchange step's per-chip
    building block, nbx.parallel.spatial): compiled Mosaic vs interpret on
    one chip, degenerate single-slab configuration (x0_cell=-1, slab_x=g:
    every global column is owned, both halo layers empty) — the same
    kernel body as the packed layout, but the slab-grid table construction
    and the traced x-offset are what this gate pins on-chip."""
    from nbx.config import body_radius, default_materials
    from nbx.ops.collide import epilogue_rows, packed_collision_blocks_local

    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(10, 90, (512, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (512, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(5.0, 20.0, 512), jnp.float32)
    radius = body_radius(mass, jnp.zeros(512, jnp.int32),
                         default_materials()) * 2.0
    outs = {}
    for interp in (False, True):
        delta, evt, body_slot, novf = packed_collision_blocks_local(
            pos, vel, mass, radius, 100.0, 8, 3, (64, 96),
            0.2, 0.05, jnp.int32(-1), 8, interpret=interp)
        outs[interp] = (*epilogue_rows(delta, evt, body_slot), novf)
    (d_c, e_c, nov_c), (d_i, e_i, nov_i) = outs[False], outs[True]
    assert int(nov_c) == int(nov_i) == 0
    err = float(jnp.abs(d_c - d_i).max()) / (float(jnp.abs(d_i).max()) + 1e-12)
    assert err < 1e-5, f"delta mismatch {err}"
    assert (np.asarray(e_c[:, 1]) == np.asarray(e_i[:, 1])).all()  # partners


def test_compiled_pp_kernel_matches_interpret():
    """P3M short-range Pallas kernel (nbx.ops.ppkernel): compiled Mosaic
    output vs interpret mode — the erfc polynomial, the 128-lane S-axis
    chunking, and the fused 27-neighborhood blocks are what this pins
    on-chip (the regular suite gates interpret vs the XLA path only)."""
    from nbx.ops.ppkernel import short_range_acc_pallas

    rng = np.random.default_rng(6)
    pos = jnp.asarray(rng.uniform(1.0, 49.0, (2048, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 2048), jnp.float32)
    outs = {}
    for interp in (False, True):
        outs[interp] = short_range_acc_pallas(
            pos, mass, 0.7, (50.0 / 8) / 3.0, 50.0, 8,
            max_per_cell=48, eps=0.05, interpret=interp,
        )
    (acc_c, ovf_c), (acc_i, ovf_i) = outs[False], outs[True]
    assert int(ovf_c) == int(ovf_i)
    err = float(jnp.abs(acc_c - acc_i).max()) / (
        float(jnp.abs(acc_i).max()) + 1e-12)
    assert err < 1e-5, f"pp kernel compiled vs interpret {err}"
