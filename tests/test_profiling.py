"""Observability tests."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from nbx import profiling


def test_step_timer_percentiles():
    t = profiling.StepTimer()
    for _ in range(20):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 20 and s["p50_ms"] >= 0 and s["p99_ms"] >= s["p50_ms"]


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with profiling.MetricsLogger(p) as m:
        m.log(0, energy=jnp.float32(1.5), momentum=jnp.array([1.0, 2, 3]))
        m.log(1, energy=2.5)
    lines = [json.loads(line) for line in open(p)]
    assert lines[0]["step"] == 0 and lines[0]["momentum"] == [1.0, 2.0, 3.0]
    assert lines[1]["energy"] == 2.5


def test_check_finite_raises():
    good = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    profiling.check_finite(good)
    bad = {"a": jnp.array([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError, match="a"):
        profiling.check_finite(bad)


def test_nan_guard():
    import jax

    with profiling.nan_guard():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.float32(-1.0)) * 1.0  # produces NaN
    assert not jax.config.jax_debug_nans


def test_trace_writes_profile(tmp_path):
    import glob

    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with profiling.trace(d):
        _ = jnp.arange(1024.0).sum().block_until_ready()
    files = glob.glob(d + "/**/*", recursive=True)
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
               for f in files if not f.endswith("/")), files
