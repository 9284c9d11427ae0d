"""Checkpoint/resume tests (SURVEY.md section 5): bit-exact round trip and
deterministic resume — a resumed run reproduces the original trajectory
including fracture RNG (the reference cannot: Math.random, index.html:418)."""

import numpy as np
import pytest

from nbx import checkpoint, scene, sim
from nbx.config import SimConfig


def _setup(tmp_path):
    cfg = SimConfig(capacity=32)
    st = scene.make_state(cfg, scene.reference_galaxy(n_disk=20, seed=1), key=7)
    for _ in range(5):
        st, _ = sim.step(st, cfg)
    return cfg, st, str(tmp_path / "snap.npz")


def test_roundtrip_bit_exact(tmp_path):
    cfg, st, path = _setup(tmp_path)
    checkpoint.save_state(path, st, cfg)
    st2, cfg2 = checkpoint.load_state(path)
    for name in ("pos", "vel", "acc", "mass", "temp", "alive", "seq", "contact"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, name)), np.asarray(getattr(st2, name)), err_msg=name
        )
    assert int(st2.step_count) == int(st.step_count)
    assert cfg2.G == cfg.G and cfg2.capacity == cfg.capacity


def test_resume_reproduces_trajectory(tmp_path):
    cfg, st, path = _setup(tmp_path)
    checkpoint.save_state(path, st, cfg)
    # continue the original
    a = st
    for _ in range(10):
        a, _ = sim.step(a, cfg)
    # resume from disk
    b, cfg2 = checkpoint.load_state(path)
    for _ in range(10):
        b, _ = sim.step(b, cfg2)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.key), np.asarray(b.key))


def test_version_gate(tmp_path):
    cfg, st, path = _setup(tmp_path)
    checkpoint.save_state(path, st, cfg)
    import numpy as np2

    z = dict(np2.load(path))
    z["format_version"] = np2.int32(99)
    np2.savez(path, **z)
    with pytest.raises(ValueError, match="format"):
        checkpoint.load_state(path)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg, st, _ = _setup(tmp_path)
    d = str(tmp_path / "orbax_ckpt")
    checkpoint.save_state_orbax(d, st, cfg)
    st2, cfg2 = checkpoint.load_state_orbax(d)
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st.contact), np.asarray(st2.contact))
    assert cfg2.G == cfg.G and cfg2.capacity == cfg.capacity
    # resumed run matches npz-resumed run
    a, _ = sim.step(st2, cfg2)
    b, _ = sim.step(st, cfg)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_sharded_orbax_roundtrip(tmp_path, eight_devices):
    """A mesh-sharded full-physics state checkpoints shard-by-shard and
    restores bit-exactly into a fresh mesh layout, shardings preserved."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    import jax.numpy as jnp

    from nbx.parallel import shard

    mesh = shard.make_mesh(8)
    rng = np.random.default_rng(0)
    n = 64
    st = shard.shard_body_state(
        mesh,
        rng.normal(0, 10, (n, 3)).astype(np.float32),
        rng.normal(0, 1, (n, 3)).astype(np.float32),
        rng.uniform(1, 5, n).astype(np.float32),
    )
    st = st._replace(temp=st.temp + 3.0)
    d = str(tmp_path / "sharded_ckpt")
    checkpoint.save_sharded_orbax(d, st)

    like = shard.shard_body_state(
        mesh, jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.zeros(n)
    )
    st2 = checkpoint.load_sharded_orbax(d, like)
    assert isinstance(st2, shard.ShardedBodyState)
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert st2.pos.sharding == like.pos.sharding
    assert st2.mass.sharding == like.mass.sharding


def test_spatial_orbax_roundtrip(tmp_path, eight_devices):
    """The slab-owned SpatialState (persistent uids + replicated scalar)
    checkpoints via the generic sharded path and resumes: restored state
    steps identically to the original."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    import jax.numpy as jnp

    from nbx.config import SimConfig
    from nbx.parallel import shard, spatial

    mesh = shard.make_mesh(8)
    rng = np.random.default_rng(1)
    n, g = 128, 8
    pos0 = rng.uniform(10, 90, (n, 3)).astype(np.float32)
    st = spatial.spatial_state_for(
        mesh, pos0,
        rng.normal(0, 1, (n, 3)).astype(np.float32),
        rng.uniform(1, 5, n).astype(np.float32),
        100.0, g,
    )
    d = str(tmp_path / "spatial_ckpt")
    checkpoint.save_sharded_orbax(d, st)

    like = spatial.spatial_state_for(
        mesh, pos0,  # same slab layout; contents are irrelevant
        np.zeros((n, 3), np.float32), np.ones(n, np.float32), 100.0, g,
        nl=np.asarray(st.uid).shape[0] // 8,
    )
    st2 = checkpoint.load_sharded_orbax(d, like)
    assert isinstance(st2, spatial.SpatialState)
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(st2.uid_next) == int(st.uid_next)

    # resume: one step from the restored state == one step from the original
    step = spatial.make_spatial_granular_step(
        mesh, SimConfig(), 100.0, g, 2, (64, 96), halo_cap=64, mig_cap=32,
        force_impl="zero", interpret=True,
    )
    key = jax.random.PRNGKey(5)
    a1, _ = step(st, 0.016, key)
    b1, _ = step(st2, 0.016, key)
    np.testing.assert_array_equal(np.asarray(a1.pos), np.asarray(b1.pos))
    np.testing.assert_array_equal(np.asarray(a1.uid), np.asarray(b1.uid))
