"""Component split of the binned-collision step: where do the ms go?

Decomposes the at-scale collision step cost at a given (N, config) into
nested prefixes, all timed in ONE process (CLAUDE.md):

  sort  = cell_sort + inverse permutation            (the O(N log N) floor)
  pass  = binned_collision_pass                      (sort + layout
          construction + Pallas kernel + epilogue)
  full  = granular_full_kdk_scan, zero force         (pass + event
          machinery: timers/merges/fractures/thermal + integration)

so (pass - sort) = layout+kernel+epilogue and (full - pass) = event
machinery. Round-2's 131k split (13.5 layout + ~12 kernel + ~6 epilogue +
~9 events of 39.5 ms, docs/RESULTS.md) came from ad-hoc probes; this makes
it a one-command measurement at any N/layout (bucketed included).

    env PYTHONPATH=/root/repo:/root/.axon_site python -m nbx.bench.collsplit \
        [N] [scene] [cfg ...]     # cfg as nbx.bench.granular (g,K,B,...)
    # defaults: 262144 cloudcd 40,16,8,u0.8 40,16,8,a0.99

Methodology: differential warmed-scan timing, each scan a data-dependency
chain with the result materialized (CLAUDE.md).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

INTERPRET = bool(os.environ.get("NBX_INTERPRET"))  # CPU smoke-test hook

import jax
import jax.numpy as jnp
import numpy as np

from nbx.bench.granular import BOX, granular_cloud, debris_disk
from nbx.collisions_scaled import granular_full_kdk_scan, make_granular_state
from nbx.config import SimConfig, body_radius
from nbx.ops.collide import _invert_order, binned_collision_pass
from nbx.ops.p3m import cell_sort

S_SHORT, S_LONG = 4, 20


@functools.partial(jax.jit, static_argnames=("steps", "box", "g"))
def _sort_scan(pos, steps: int, box: float, g: int):
    def body(p, _):
        order, starts, cid = cell_sort(p, box, g)
        inv = _invert_order(order, p.shape[0])
        # dependency: nudge positions by a permutation-derived epsilon
        return p + (inv % 7).astype(jnp.float32)[:, None] * 1e-7, None

    out, _ = jax.lax.scan(body, pos, None, length=steps)
    return out


@functools.partial(jax.jit, static_argnames=(
    "steps", "box", "g", "k", "band", "packed", "max_blocks", "buckets"))
def _pass_scan(pos, vel, mass, radius, steps: int, box: float, g: int,
               k: int, band, packed, max_blocks, buckets):
    def body(carry, _):
        p, v = carry
        dvel, dpos, dtemp, best, nb, novf, small = binned_collision_pass(
            p, v, mass, radius, box, g, max_per_cell=k, band_cells=band,
            packed_caps=packed, max_blocks=max_blocks, buckets=buckets,
            interpret=INTERPRET,
        )
        return (p + dpos, v + dvel), nb

    (p, v), nb = jax.lax.scan(body, (pos, vel), None, length=steps)
    return p, nb


def _time(run, steps_pair=(S_SHORT, S_LONG)):
    s, l = steps_pair
    run(s)
    run(l)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(s)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(l)
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (l - s))
    return best * 1e3


def main(argv):
    n = int(argv[0]) if argv else 262144
    scene = argv[1] if len(argv) > 1 else "cloudcd"
    box = BOX
    if scene == "cloudcd":
        box = BOX * (n / 131072.0) ** (1.0 / 3.0)
        scene = "cloud"
    if scene == "cloud":
        pos, vel, mass = granular_cloud(n, box=box)
    else:
        pos, vel, mass = debris_disk(n - 1)
    st0 = make_granular_state(pos, vel, mass, key=0)
    cfg = SimConfig(G=0.5, dt=0.016, sub_steps=1, merge_time=0.25,
                    fracture_threshold=8.0)
    cfg_args = argv[2:] or ["40,16,8,u0.8", "40,16,8,a0.99"]

    for a in cfg_args:
        parts = a.split(",")
        g, k = int(parts[0]), int(parts[1])
        band = int(parts[2]) if len(parts) > 2 else None
        packed = max_blocks = buckets = None
        if len(parts) > 3:
            mode = parts[3][0]
            q = float(parts[3][1:]) if len(parts[3]) > 1 else (
                0.8 if mode == "u" else 1.0)
            if mode == "u":
                from nbx.ops.collide import bucketed_layout_for
                buckets = bucketed_layout_for(st0.pos, box, g, band,
                                              split_quantile=q)
            elif mode == "a":
                from nbx.ops.collide import packed_caps_for
                packed = packed_caps_for(st0.pos, box, g, band, quantile=q)
            elif mode == "c":
                from nbx.ops.collide import packed_layout_for
                lay = packed_layout_for(st0.pos, box, g, band, quantile=q)
                packed, max_blocks = lay["packed_caps"], lay["max_blocks"]
            else:
                packed = (int(parts[3]), int(parts[4]))

        ms_sort = _time(lambda s: np.asarray(
            _sort_scan(st0.pos, s, box, g)))
        radius = body_radius(st0.mass, st0.mat, cfg.materials)
        ms_pass = _time(lambda s: np.asarray(_pass_scan(
            st0.pos, st0.vel, st0.mass, radius, s, box, g, k, band,
            packed, max_blocks, buckets)[0]))

        def run_full(s):
            st, totals = granular_full_kdk_scan(
                st0, cfg, box, n_steps=s, n_cells=g, max_per_cell=k,
                band_cells=band, packed_caps=packed, max_blocks=max_blocks,
                buckets=buckets, force_impl="zero", interpret=INTERPRET,
            )
            np.asarray(st.pos)

        ms_full = _time(run_full)
        print(json.dumps(dict(
            n=n, cfg=a, box=round(box, 2),
            ms_sort=round(ms_sort, 2),
            ms_pass=round(ms_pass, 2),
            ms_full=round(ms_full, 2),
            ms_layout_kernel_epilogue=round(ms_pass - ms_sort, 2),
            ms_event_machinery=round(ms_full - ms_pass, 2),
        )), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
