"""Spatial halo-exchange step benchmark: protocol overhead on real HW.

Times nbx.parallel.spatial's halo-exchange granular step against the
single-chip granular_full_kdk_scan on the SAME scene and kernel config,
in the SAME process (the only valid comparison through the tunnel —
CLAUDE.md). On the one real chip this runs D=1: the measured gap is the
protocol overhead (migration + halo ppermutes + slot churn + PM grid
psum), i.e. the price of the O(N/D)-memory design at its worst
(no work sharing). Multi-chip scaling needs real hardware wider than one
chip; the virtual CPU mesh validates semantics, not time.

    env PYTHONPATH=/root/repo:/root/.axon_site python -m nbx.bench.spatial \
        [N] [g[,B[,Tc,Sc]]] [force]
    # defaults: 131072 32,8,96,104 pm
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from nbx.bench.granular import BOX, granular_cloud
from nbx.collisions_scaled import granular_full_kdk_scan, make_granular_state
from nbx.config import SimConfig
from nbx.parallel import shard, spatial


def main(argv):
    n = int(argv[0]) if argv else 131072
    parts = (argv[1] if len(argv) > 1 else "32,8,96,104").split(",")
    if len(parts) == 3:
        raise SystemExit(
            f"bad config {argv[1]!r}: caps need BOTH Tc,Sc (g[,B[,Tc,Sc]])"
        )
    g = int(parts[0])
    band = int(parts[1]) if len(parts) > 1 else 8
    caps = (int(parts[2]), int(parts[3])) if len(parts) > 3 else (96, 104)
    force = argv[2] if len(argv) > 2 else "pm"
    pos, vel, mass = granular_cloud(n)
    cfg = SimConfig(G=0.5, dt=0.016, sub_steps=1, merge_time=0.25,
                    fracture_threshold=8.0)
    h = cfg.dt
    interp = jax.default_backend() != "tpu"  # CPU smoke-test mode

    # ---- single-chip reference (scan slope, warmed both lengths) --------
    st0 = make_granular_state(pos, vel, mass, key=0)

    def run_ref(steps):
        st, totals = granular_full_kdk_scan(
            st0, cfg, BOX, n_steps=steps, n_cells=g, band_cells=band,
            packed_caps=caps, force_impl=force, pm_grid=128,
            interpret=interp,
        )
        np.asarray(st.pos)
        return totals

    run_ref(4)
    run_ref(20)
    best_ref = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run_ref(4)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot = run_ref(20)
        best_ref = min(best_ref, (time.perf_counter() - t0 - t_s) / 16)
    print(json.dumps(dict(
        path="single_chip_scan", n=n, g=g, band=band, caps=caps,
        force=force, ms_per_step=round(best_ref * 1e3, 2),
        n_bounces=int(tot["n_bounces"]),
    )), flush=True)

    # ---- spatial step, D = devices available -----------------------------
    d = len(jax.devices())
    mesh = shard.make_mesh(d)
    step = spatial.make_spatial_granular_step(
        mesh, cfg, BOX, g, band, caps,
        halo_cap=max(256, 2 * n // g), mig_cap=max(256, n // 64),
        force_impl=force, pm_grid=128, interpret=interp,
    )
    st = spatial.spatial_state_for(mesh, pos, vel, mass, BOX, g)
    key = jax.random.PRNGKey(0)

    # ONE scan dispatch per measurement (20 per-step dispatches would
    # time the tunnel RTT, not the step — CLAUDE.md methodology); the
    # per-step key fold moves inside the scan
    import functools

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run_scan(st, steps):
        def body(carry, i):
            s, _ = step(carry, h, jax.random.fold_in(key, i))
            return s, None

        stf, _ = jax.lax.scan(
            body, st, jnp.arange(steps, dtype=jnp.int32)
        )
        return stf

    def run_sp(steps, st):
        stf = run_scan(st, steps)
        np.asarray(stf.pos)
        return stf

    np.asarray(run_scan(st, 4).pos)  # warm both executables
    stf = run_sp(20, st)
    _, counters = step(stf, h, jax.random.fold_in(key, 20))  # not timed
    counters = {k: int(v) for k, v in counters.items()}
    best_sp = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run_sp(4, st)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_sp(20, st)
        best_sp = min(best_sp, (time.perf_counter() - t0 - t_s) / 16)
    print(json.dumps(dict(
        path="spatial_halo_step", n=n, d=d, g=g, band=band, caps=caps,
        force=force, ms_per_step=round(best_sp * 1e3, 2),
        overhead_vs_single=round(best_sp / best_ref, 2),
        n_overflow=int(counters["n_overflow"]),
        n_dropped=int(counters["n_dropped"]),
        in_transit=int(counters["in_transit"]),
    )), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
