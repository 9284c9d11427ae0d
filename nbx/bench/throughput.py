"""Kernel throughput measurement.

Methodology note (hard-won on the axon-tunneled chip): timing individual
dispatches is untrustworthy here — the remote-execution relay memoizes
repeated (executable, args) calls and the tunnel adds ~0.3s RTT, producing
both 1000x-too-fast and 2x-too-slow readings. The only trustworthy number is
wall-clock around ONE dispatched `lax.scan` whose iterations form a data
dependency chain (each force evaluation feeds the next positions), so no
iteration can be elided, cached, or overlapped away.

Usage: python -m nbx.bench.throughput [n] [reps] [precision[,precision...]]

precision may be a comma list ("f32r,hyb"): all variants run interleaved in
THIS process — cross-process TPU timing drifts up to ~1.5x (CLAUDE.md), so
variant comparisons must come from one process.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("reps", "tile_i", "tile_j", "precision")
)
def chained_force_evals(
    pos, mass, G, eps, reps: int, tile_i: int = 1024, tile_j: int = 2048,
    precision: str = "f32r",
):
    """reps force evaluations, each input perturbed by the previous output
    (KDK-drift-like dependency chain)."""
    if precision == "jnp":  # CPU/debug fallback
        from nbx import forces

        force = lambda p: forces.accelerations_blocked(
            p, mass, G, eps, min(1024, p.shape[0])
        )
    else:
        from nbx.ops.pairwise import pairwise_acc

        force = lambda p: pairwise_acc(
            p, mass, G, eps, tile_i=tile_i, tile_j=tile_j, precision=precision
        )

    def body(p, _):
        return p + force(p) * jnp.float32(1e-6), None

    out, _ = jax.lax.scan(body, pos, None, length=reps)
    return out


def _sync(x) -> float:
    """Force execution AND result materialization.

    jax.block_until_ready is NOT a reliable sync on the axon-tunneled
    backend (measured: a 200-eval scan "completed" in 0.00s) — only a host
    transfer proves the device actually ran. Returns a checksum so the
    transfer can't be optimized away.
    """
    import numpy as np

    return float(np.asarray(x).sum())


def measure_rate(
    pos, mass, G=0.5, eps=0.5, reps: int = 32, **kw
) -> tuple[float, float]:
    """Returns (pairs_per_sec, ms_per_eval).

    Slope timing of two pre-compiled, fully materialized scan dispatches
    ((1+reps)-eval minus 1-eval) with fresh inputs per timed call: constant
    costs — tunnel RTT, host transfer, dispatch — cancel in the difference.
    """
    if kw.get("precision") is None and jax.default_backend() != "tpu":
        kw["precision"] = "jnp"
    n = pos.shape[0]
    long_, short = 1 + reps, 1
    # compile + warm both executables
    _sync(chained_force_evals(pos, mass, G, eps, long_, **kw))
    _sync(chained_force_evals(pos, mass, G, eps, short, **kw))
    bump = lambda k: pos + jnp.float32(1e-4 * k)
    t0 = time.time()
    _sync(chained_force_evals(bump(1), mass, G, eps, long_, **kw))
    dt_long = time.time() - t0
    t0 = time.time()
    _sync(chained_force_evals(bump(2), mass, G, eps, short, **kw))
    dt_short = time.time() - t0
    dt = max(dt_long - dt_short, 1e-9) / reps
    return n * n / dt, dt * 1e3


def main(n: int = 262144, reps: int = 10, precision: str = "f32r"):
    from nbx import scene

    sc = scene.cold_collapse_disk(n=n, seed=0)
    pos = jnp.asarray(sc["pos"])
    mass = jnp.asarray(sc["mass"])
    rate = 0.0
    for prec in precision.split(","):
        rate, ms = measure_rate(pos, mass, reps=reps, precision=prec)
        print(
            f"N={n} precision={prec}: {ms:.1f} ms/eval = {rate:.3e} pairs/s",
            file=sys.stderr,
        )
        print({"metric": "pairs_per_sec", "value": rate, "n": n,
               "precision": prec})
    return rate


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    prec = sys.argv[3] if len(sys.argv) > 3 else "f32r"
    main(n, reps, prec)
