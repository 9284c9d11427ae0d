"""Granular full-physics step benchmark: fused collision kernel configs.

Times granular_full_kdk_scan (gravity + fused-kernel collisions with
merge/fracture/timers + thermal) per step at scale, for a sweep of
(n_cells, max_per_cell, band_cells) kernel configurations.

    env PYTHONPATH=/root/repo:/root/.axon_site python -m nbx.bench.granular \
        [N] [scene] [force] [cfg ...]
    # scene: disk (contact-rich annulus) | cloud (uniform, exact binning)
    #        | cloud@<box> (explicit box) | cloudcd (box ~ N^(1/3):
    #        constant density vs the 131k baseline)
    # force: zero (isolates the collision kernel) | pallas | pm | ...
    # cfg:   g,K[,B[,Tc,Sc]]  e.g. 32,16,6  (B = band_cells, omit for full
    #        columns); Tc,Sc = band-PACKED per-window caps (target rows,
    #        source lanes per guarded strip) — K is ignored when packed;
    #        g,K,B,a = AUTO caps via packed_caps_for on the initial frame;
    #        g,K,B,c = occupancy-COMPACTED packed layout, caps + block
    #        budget auto-measured via packed_layout_for (peaked scenes);
    #        g,K,B,c0.999 = same with a cap QUANTILE (counted overflow
    #        instead of tail-sized caps — the N-scaling tax trade);
    #        g,K,B,a0.999 = whole-grid packed with a cap quantile;
    #        g,K,B,u0.8x4 = bucketed with windows_per_block=4 (multi-
    #        window kernel programs); a trailing s/g on the bucket token
    #        ("u0.8s") forces the slice/grid strips construction
    #        (default: the size-based auto rule — nbx.ops.collide);
    #        g,K,B,Tc,Sc,M = explicit compacted (M = max_blocks)

Methodology (CLAUDE.md): differential warmed-scan timing — warm the EXACT
executables for both scan lengths, wall-clock each dispatch, materialize
the result, slope = (t_long - t_short) / (steps_long - steps_short). Scan
iterations form a data-dependency chain through the state. Dispatches stay
under the ~30 s tunnel limit.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbx.collisions_scaled import granular_full_kdk_scan, make_granular_state
from nbx.config import SimConfig

BOX = 100.0


def debris_disk(n: int, seed: int = 0):
    """Annular debris disk (examples/granular_demo.py) — contact-rich.

    Masses scale as 32768/n beyond the demo's N so the TOTAL body volume
    stays ~the annulus volume: at fixed mass the 131k disk would be ~4x
    over-packed (unphysical) and nearly every body would overflow its cell.
    """
    rng = np.random.default_rng(seed)
    r = rng.uniform(8.0, 28.0, n)
    th = rng.uniform(0, 2 * np.pi, n)
    pos = np.stack(
        [50 + r * np.cos(th), 50 + rng.normal(0, 0.4, n), 50 + r * np.sin(th)],
        axis=1,
    ).astype(np.float32)
    mass = (rng.uniform(0.05, 0.4, n) * min(1.0, 32768 / n)).astype(
        np.float32
    )
    v = np.sqrt(0.5 * 2000.0 / r)
    vel = np.stack(
        [-v * np.sin(th), np.zeros(n), v * np.cos(th)], axis=1
    ).astype(np.float32)
    # The demo's central m=2000 body has radius ~7.8 — larger than any
    # sane cell at this N, so it alone would trip cell_too_small and
    # poison every binned measurement. It only matters for orbital
    # gravity, which a 20-step collision bench doesn't resolve: park the
    # slot dead (mass 0 = exerts nothing, skips collisions).
    pos = np.concatenate([[[50.0, 50.0, 50.0]], pos]).astype(np.float32)
    vel = np.concatenate([[[0.0, 0.0, 0.0]], vel]).astype(np.float32)
    mass = np.concatenate([[0.0], mass]).astype(np.float32)
    return pos, vel, mass


def granular_cloud(n: int, seed: int = 0, box: float = BOX):
    """Uniform cloud in [0.1 box, 0.9 box)^3 with converging velocity
    jitter — near-uniform cell occupancy (exact binning at sane K),
    contacts fire."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.1 * box, 0.9 * box, (n, 3)).astype(np.float32)
    vel = (
        (0.5 * box - pos) * 0.02 + rng.normal(0, 0.3, (n, 3))
    ).astype(np.float32)
    mass = rng.uniform(0.05, 0.4, n).astype(np.float32)
    return pos, vel, mass


def time_config(st0, cfg, g, k, band, s_short=4, s_long=20,
                force_impl="pm", pm_grid=128, packed=None, max_blocks=None,
                buckets=None, box: float = BOX, windows: int = 1,
                construction: str = "auto"):
    def run(steps):
        st, totals = granular_full_kdk_scan(
            st0, cfg, box, n_steps=steps, n_cells=g, max_per_cell=k,
            band_cells=band, packed_caps=packed, max_blocks=max_blocks,
            buckets=buckets, force_impl=force_impl, pm_grid=pm_grid,
            windows_per_block=windows, construction=construction,
        )
        np.asarray(st.pos)  # materialize = the only reliable sync
        return st, totals

    run(s_short)  # warm BOTH exact executables
    run(s_long)
    best = float("inf")
    totals = None
    for _ in range(2):
        t0 = time.perf_counter()
        _, _ = run(s_short)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        st, totals = run(s_long)
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (s_long - s_short))
    return best, {k_: int(v) if v.ndim == 0 else v
                  for k_, v in totals.items()}


def main(argv):
    # N may be a comma list ("131072,262144"): all Ns run in THIS process —
    # cross-process TPU timing drifts up to ~1.5x (CLAUDE.md), so scaling
    # tables must come from one interleaved process.
    ns = ([int(x) for x in argv[0].split(",")] if argv else [131072])
    scene = argv[1] if len(argv) > 1 else "disk"
    force = argv[2] if len(argv) > 2 else "pm"
    for n in ns:
        _run_one(n, scene, force, argv)


def _run_one(n, scene, force, argv):
    # "cloud@126.0" pins an explicit box; "cloudcd" scales the box with
    # N^(1/3) so density (and therefore per-cell pair work at fixed cell
    # SIZE) is constant vs the 131k baseline — separates the physics part
    # of N-scaling (denser box -> more pairs) from any layout cap tax.
    box = BOX
    if scene.startswith("cloud@"):
        box = float(scene.split("@", 1)[1])
        scene = "cloud"
    elif scene == "cloudcd":
        box = BOX * (n / 131072.0) ** (1.0 / 3.0)
        scene = "cloud"
    cfgs = []
    for a in argv[3:]:
        parts = a.split(",")
        if len(parts) == 4 and parts[3][0] not in ("a", "c", "u"):
            raise SystemExit(
                f"bad cfg {a!r}: packed caps need BOTH Tc,Sc (g,K,B,Tc,Sc)"
                " or 'a'/'c'/'u' (optionally 'a0.999'/'u0.8') for auto"
            )
        if len(parts) > 3 and parts[3][0] in ("a", "c", "u"):
            mode = {"a": "auto", "c": "compact", "u": "bucket"}[parts[3][0]]
            rest = parts[3][1:]
            # bucket token may carry a construction override suffix
            # ("u0.8s" = slice, "u0.8g" = grid-gather; default auto) and
            # xW = windows_per_block ("u0.8x4")
            constr = "auto"
            if mode == "bucket" and rest and rest[-1] in ("s", "g"):
                constr = {"s": "slice", "g": "grid"}[rest[-1]]
                rest = rest[:-1]
            w_blk = 1
            if mode == "bucket" and "x" in rest:
                rest, w_s = rest.split("x", 1)
                w_blk = int(w_s)
            q = float(rest) if rest else (
                0.8 if mode == "bucket" else 1.0
            )
            packed = (mode, q, w_blk, constr)
        elif len(parts) > 3:
            packed = (int(parts[3]), int(parts[4]))
        else:
            packed = None
        cfgs.append((
            int(parts[0]), int(parts[1]),
            int(parts[2]) if len(parts) > 2 else None,
            packed,
            int(parts[5]) if len(parts) > 5 else None,
        ))
    if not cfgs:
        cfgs = [(32, 16, 8, (96, 104), None), (32, 16, 4, (48, 72), None),
                (32, 16, 4, None, None), (32, 16, None, None, None),
                (28, 12, 6, None, None)]
    if scene == "cloud":
        pos, vel, mass = granular_cloud(n, box=box)
    else:
        pos, vel, mass = debris_disk(n - 1)
    st0 = make_granular_state(pos, vel, mass, key=0)
    cfg = SimConfig(G=0.5, dt=0.016, sub_steps=1, merge_time=0.25,
                    fracture_threshold=8.0)
    for g, k, band, packed, max_blocks in cfgs:
        buckets = None
        windows = 1
        constr = "auto"
        try:
            if isinstance(packed, tuple) and packed and packed[0] == "bucket":
                from nbx.ops.collide import bucketed_layout_for

                buckets = bucketed_layout_for(st0.pos, box, g, band,
                                              split_quantile=packed[1])
                windows = packed[2] if len(packed) > 2 else 1
                constr = packed[3] if len(packed) > 3 else "auto"
                packed = None
                print(json.dumps(dict(buckets=buckets, windows=windows,
                                      construction=constr)), flush=True)
            elif isinstance(packed, tuple) and packed and packed[0] == "auto":
                from nbx.ops.collide import packed_caps_for

                packed = packed_caps_for(st0.pos, box, g, band,
                                         quantile=packed[1])
            elif isinstance(packed, tuple) and packed and packed[0] == "compact":
                from nbx.ops.collide import packed_layout_for

                lay = packed_layout_for(st0.pos, box, g, band,
                                        quantile=packed[1])
                packed = lay["packed_caps"]
                max_blocks = lay["max_blocks"]
                print(json.dumps(dict(layout=lay)), flush=True)
        except ValueError as e:
            # auto sizing rejected the config — report it, keep sweeping
            print(json.dumps(dict(
                n=n, scene=scene, n_cells=g, band_cells=band,
                rejected=str(e),
            )), flush=True)
            continue
        try:
            ms, totals = time_config(st0, cfg, g, k, band, force_impl=force,
                                     packed=packed, max_blocks=max_blocks,
                                     buckets=buckets, box=box,
                                     windows=windows, construction=constr)
        except Exception as e:  # compile/run failure — report, keep sweeping
            # (measured: whole-grid BANDED tables at g=128 ask for a 554 GB
            # src gather — the bench must survive a config that can't build)
            print(json.dumps(dict(
                n=n, scene=scene, n_cells=g, max_per_cell=k, band_cells=band,
                packed_caps=packed, max_blocks=max_blocks,
                failed=str(e)[:300],
            )), flush=True)
            continue
        print(json.dumps(dict(
            n=n, scene=scene, force=force, box=round(box, 2),
            n_cells=g, max_per_cell=k, band_cells=band, packed_caps=packed,
            max_blocks=max_blocks, buckets=buckets, windows=windows,
            construction=constr,
            ms_per_step=round(ms * 1e3, 2),
            n_overflow=totals["n_overflow"],
            cell_too_small=bool(totals["cell_too_small"]),
            n_bounces=totals["n_bounces"], n_merges=totals["n_merges"],
            n_fractures=totals["n_fractures"],
        )), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
