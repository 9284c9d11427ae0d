"""Energy-drift gate (BASELINE config 3): Plummer sphere N=16k, 10k KDK
steps, relative energy drift must stay < 1e-4.

Everything runs on device: the force evaluation is the Pallas kernel, the
time loop is one lax.scan, and energies are sampled on device every
`diag_every` steps with the Pallas potential kernel — a 10k-step gate costs
one dispatch + one small readback.

Usage:  python -m nbx.bench.drift [n] [steps] [precision]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "diag_every", "precision", "interpret",
                     "compensated"),
)
def drift_run(
    pos,
    vel,
    mass,
    G,
    eps,
    h,
    n_steps: int,
    diag_every: int = 100,
    precision: str = "f32r",
    interpret: bool = False,
    compensated: bool = True,
):
    """Scan n_steps of KDK with warm-started acceleration; returns
    (final pos, final vel, energies [n_steps / diag_every]).

    compensated=True uses Kahan-compensated position/velocity updates: over
    10k steps the f32 update roundoff (|dx| ~ 1e-7 |x| per step, random-walk
    accumulation) otherwise becomes a visible energy-drift floor.
    """
    from nbx.ops.pairwise import pairwise_acc, potential_per_body

    force = lambda p: pairwise_acc(
        p, mass, G, eps, precision=precision, interpret=interpret
    )

    def energy(p, v):
        phi = potential_per_body(p, mass, G, eps, interpret=interpret)
        return 0.5 * jnp.sum(mass * jnp.sum(v * v, -1)) + 0.5 * jnp.sum(mass * phi)

    def kadd(x, c, dx):
        """Kahan: (x, carry) + dx."""
        y = dx - c
        t = x + y
        c = (t - x) - y
        return t, c

    def chunk(carry, _):
        p, v, a, pc, vc = carry

        def substep(s, _):
            p, v, a, pc, vc = s
            if compensated:
                v, vc = kadd(v, vc, a * (0.5 * h))
                p, pc = kadd(p, pc, v * h)
                a = force(p)
                v, vc = kadd(v, vc, a * (0.5 * h))
            else:
                v = v + a * (0.5 * h)
                p = p + v * h
                a = force(p)
                v = v + a * (0.5 * h)
            return (p, v, a, pc, vc), None

        (p, v, a, pc, vc), _ = jax.lax.scan(
            substep, (p, v, a, pc, vc), None, length=diag_every
        )
        return (p, v, a, pc, vc), energy(p, v)

    acc0 = force(pos)
    e0 = energy(pos, vel)
    zero = jnp.zeros_like(pos)
    (pos, vel, _, _, _), energies = jax.lax.scan(
        chunk, (pos, vel, acc0, zero, zero), None, length=n_steps // diag_every
    )
    return pos, vel, jnp.concatenate([e0[None], energies])


def main(
    n: int = 16384,
    n_steps: int = 10000,
    precision: str = "f32r",
    eps_factor: float = 1.0,
    h_div: float = 200.0,
    diag_every: int = 100,
    json_out: str | None = None,
):
    from nbx import scene

    sc = scene.plummer(n=n, total_mass=float(n), scale_radius=10.0, G=1.0, seed=0)
    pos = jnp.asarray(sc["pos"])
    vel = jnp.asarray(sc["vel"])
    mass = jnp.asarray(sc["mass"])
    # mean inter-particle softening a * N^(-1/3) (standard collisionless choice)
    G, eps = 1.0, eps_factor * 10.0 * n ** (-1 / 3)
    # dynamical time ~ sqrt(R^3 / GM); step well under it
    t_dyn = float(np.sqrt(10.0**3 / (G * n)))
    h = t_dyn / h_div
    print(
        f"Plummer N={n}, steps={n_steps}, h={h:.2e}, eps={eps:.3f}, "
        f"precision={precision}",
        file=sys.stderr,
    )
    t0 = time.time()
    # Host-chunked dispatches: the tunneled TPU worker dies on single
    # dispatches beyond ~30s of device time (measured; see CLAUDE.md), so
    # long gates run as segments carrying (pos, vel) between dispatches.
    # Each segment re-warms acc with one extra force eval (KDK-consistent).
    # Segment size is ADAPTIVE: one diag_every-step probe is compiled and
    # timed (second run, so compile time is excluded — the warm-exact-
    # executable rule), then segments target ~20 s of device time each.
    # At 262k (378 ms/step) that is ~50 steps/dispatch; the old fixed 2000
    # would be a ~13 min dispatch, an instant worker kill.
    es = []
    done = 0
    pos, vel, energies = drift_run(
        pos, vel, mass, G, eps, h, diag_every, diag_every, precision
    )
    es.append(np.asarray(energies))
    done += diag_every
    t1 = time.time()
    pos, vel, energies = drift_run(
        pos, vel, mass, G, eps, h, diag_every, diag_every, precision
    )
    es.append(np.asarray(energies)[1:])
    done += diag_every
    probe_s = time.time() - t1
    segment = max(1, int(20.0 * diag_every / max(probe_s, 1e-3) / diag_every))
    segment *= diag_every
    print(
        f"probe: {probe_s:.1f}s / {diag_every} steps -> "
        f"segment={segment} steps/dispatch",
        file=sys.stderr,
    )
    while done < n_steps:
        steps = min(segment, n_steps - done)
        steps -= steps % diag_every
        if steps == 0:
            break
        pos, vel, energies = drift_run(
            pos, vel, mass, G, eps, h, steps, diag_every, precision
        )
        # materialize: block_until_ready alone is not a reliable sync
        # through the axon relay (see nbx/bench/throughput.py)
        es.append(np.asarray(energies)[1:])  # drop repeated e0
        done += steps
    e = np.concatenate(es)
    wall = time.time() - t0
    drift = np.abs(e - e[0]).max() / abs(e[0])
    rate = n * n * done / wall
    print(
        f"E0={e[0]:.6e} drift_max={drift:.3e} wall={wall:.1f}s "
        f"(~{rate:.2e} pairs/s incl. compile)",
        file=sys.stderr,
    )
    result = {
        "metric": f"relative_energy_drift_{done}_steps",
        "value": float(drift),
        "gate": 1e-4,
        "pass": bool(drift < 1e-4),
        "precision": precision,
        "n": n,
        "h": h,
        "eps": eps,
    }
    print(result)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(result, f)
    return drift


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    prec = sys.argv[3] if len(sys.argv) > 3 else "f32r"
    diag = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    out = sys.argv[5] if len(sys.argv) > 5 else None
    main(n, steps, prec, diag_every=diag, json_out=out)
