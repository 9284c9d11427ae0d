"""Diagnostics: on-device measurement, scan-logged runs, JSONL output."""

import json

import numpy as np

from nbx import diagnostics, scene, sim
from nbx.config import SimConfig


def test_measure_known_two_body():
    cfg = SimConfig(capacity=4, collisions=False, G=1.0, softening=0.0)
    sc = scene.kepler_two_body(m1=3.0, m2=1.0, a=10.0, G=0.5)
    st = scene.make_state(cfg.replace(G=0.5), sc)
    d = diagnostics.measure(st, cfg.replace(G=0.5))
    # COM frame: total momentum ~ 0
    np.testing.assert_allclose(np.asarray(d.momentum), 0.0, atol=1e-5)
    assert float(d.total_mass) == 4.0
    assert int(d.n_alive) == 2
    assert float(d.potential) < 0 < float(d.kinetic)


def test_run_logged_writes_jsonl(tmp_path):
    cfg = SimConfig(capacity=16, collisions=False)
    st = scene.make_state(cfg, scene.kepler_two_body())
    p = str(tmp_path / "diag.jsonl")
    st, diags = diagnostics.run_logged(st, cfg, 20, path=p)
    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 20
    assert lines[0]["n_alive"] == 2
    assert "energy" in lines[0] and len(lines[0]["momentum"]) == 3
    # energy roughly conserved for the Kepler pair
    es = [r["energy"] for r in lines]
    assert abs(es[-1] - es[0]) / abs(es[0]) < 1e-3


def test_relative_energy_drift():
    cfg = SimConfig(capacity=16, collisions=False)
    st = scene.make_state(cfg, scene.kepler_two_body())
    _, diags = diagnostics.run_logged(st, cfg, 50)
    drift = float(diagnostics.relative_energy_drift(diags))
    assert 0 <= drift < 1e-3
