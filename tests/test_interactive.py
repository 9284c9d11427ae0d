"""Interactive host API tests (the reference's GUI + input layer,
index.html:768-871)."""

import numpy as np

from nbx.config import SimConfig
from nbx.interactive import Simulation


def test_lifecycle():
    s = Simulation(SimConfig(capacity=64), scenario="galaxy", n_disk=20, seed=0)
    assert s.n_alive == 21
    ev = s.step(3)
    assert s.n_alive >= 1
    s.reset("collision")
    assert s.n_alive == 2


def test_live_retune_changes_physics():
    s = Simulation(SimConfig(capacity=8, collisions=False), scenario="kepler")
    s.set(G=0.0)
    v0 = s.bodies()["vel"].copy()
    s.step(10)
    np.testing.assert_allclose(s.bodies()["vel"], v0, atol=1e-6)  # no force
    s.set(G=0.5)
    s.step(10)
    assert np.abs(s.bodies()["vel"] - v0).max() > 1e-4


def test_spawn_drag_slingshot():
    """vel = -0.5 * (end - start) (index.html:834)."""
    s = Simulation(SimConfig(capacity=8, collisions=False), scenario="collision")
    s.spawn_drag([0, 0, 0], [10, 0, 0], mass=5.0)
    b = s.bodies()
    np.testing.assert_allclose(b["vel"][-1], [-5.0, 0, 0])
    np.testing.assert_allclose(b["pos"][-1], [0, 0, 0])
    assert b["mass"][-1] == 5.0


def test_spawn_uses_config_mass():
    s = Simulation(SimConfig(capacity=8, spawn_mass=33.0, collisions=False),
                   scenario="collision")
    s.spawn([1, 2, 3], [0, 0, 0])
    assert s.bodies()["mass"][-1] == 33.0


def test_save_load_roundtrip(tmp_path):
    s = Simulation(SimConfig(capacity=16), scenario="galaxy", n_disk=10, seed=2)
    s.step(5)
    p = str(tmp_path / "sim.npz")
    s.save(p)
    s2 = Simulation.load(p)
    np.testing.assert_array_equal(s2.bodies()["pos"], s.bodies()["pos"])
    assert s2.cfg.G == s.cfg.G
    s2.step(2)  # resumed sim steps fine


def test_measure():
    s = Simulation(SimConfig(capacity=16, collisions=False), scenario="kepler")
    d = s.measure()
    assert np.isfinite(d.kinetic) and np.isfinite(d.potential)
    assert d.n_alive == 2
