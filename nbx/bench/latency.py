"""Per-step latency across N = 1k..1M (BASELINE.json metric).

One KDK gravity step per measurement, amortized over a data-dependent
lax.scan of `reps` steps with materialized sync (per-dispatch timing is
meaningless through the remote relay — see nbx/bench/throughput.py). The
reported value is the steady-state per-step device latency; on a quiet chip
the p50 == the scan-amortized mean to measurement noise.

Usage: python -m nbx.bench.latency [reps]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def kdk_scan(pos, vel, mass, G, eps, h, reps: int, precision: str | None = None,
             acc0=None):
    """reps KDK steps under one scan. Returns (pos, vel, acc) so callers
    stepping frame-by-frame can carry the acceleration (leapfrog continuity);
    acc0 defaults to zeros — the reference's fresh-body convention.
    precision=None auto-selects: Pallas f32r on TPU, jnp elsewhere."""
    if precision is None:
        precision = "f32r" if jax.default_backend() == "tpu" else "jnp"
    return _kdk_scan(pos, vel, mass, G, eps, h, reps, precision, acc0)


@functools.partial(jax.jit, static_argnames=("reps", "precision"))
def _kdk_scan(pos, vel, mass, G, eps, h, reps: int, precision: str,
              acc0=None):
    if precision == "jnp":
        from nbx import forces

        block = min(1024, pos.shape[0])
        force = lambda p: forces.accelerations_blocked(p, mass, G, eps, block)
    else:
        from nbx.ops.pairwise import pairwise_acc

        force = lambda p: pairwise_acc(p, mass, G, eps, precision=precision)

    def body(c, _):
        p, v, a = c
        v = v + a * (0.5 * h)
        p = p + v * h
        a = force(p)
        v = v + a * (0.5 * h)
        return (p, v, a), None

    if acc0 is None:
        acc0 = jnp.zeros_like(pos)
    (p, v, a), _ = jax.lax.scan(body, (pos, vel, acc0), None, length=reps)
    return p, v, a


def step_latency_ms(n: int, reps: int = 20, precision: str | None = None) -> float:
    from nbx import scene

    if precision is None:
        precision = "f32r" if jax.default_backend() == "tpu" else "jnp"
    sc = scene.plummer(n=n, total_mass=float(n), scale_radius=10.0, seed=0)
    pos = jnp.asarray(sc["pos"])
    vel = jnp.asarray(sc["vel"])
    mass = jnp.asarray(sc["mass"])
    args = (pos, vel, mass, 1.0, 0.1, 1e-4)
    float(np.asarray(kdk_scan(*args, reps, precision)[0]).sum())  # compile+warm
    float(np.asarray(kdk_scan(*args, 1, precision)[0]).sum())
    t0 = time.time()
    float(np.asarray(kdk_scan(pos + 1e-5, vel, mass, 1.0, 0.1, 1e-4, reps,
                              precision)[0]).sum())
    dt_long = time.time() - t0
    t0 = time.time()
    float(np.asarray(kdk_scan(pos + 2e-5, vel, mass, 1.0, 0.1, 1e-4, 1,
                              precision)[0]).sum())
    dt_short = time.time() - t0
    return max(dt_long - dt_short, 1e-9) / (reps - 1) * 1e3


def main(reps: int | None = None):
    on_tpu = jax.default_backend() == "tpu"
    ns = [1024, 4096, 16384, 65536, 262144, 1048576] if on_tpu else [1024, 4096]
    # rep counts sized so per-step time >> tunnel RTT jitter / reps
    default_reps = {1024: 800, 4096: 800, 16384: 400, 65536: 100,
                    262144: 16, 1048576: 4}
    out = {}
    for n in ns:
        r = reps or default_reps.get(n, 16)
        ms = step_latency_ms(n, r)
        out[n] = ms
        print(f"N={n}: {ms:.2f} ms/step ({r} reps)", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "p50_step_latency_ms", "by_n": out}))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
