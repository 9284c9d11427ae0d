"""Stage split of the bucketed collision LAYOUT at two N, same process.

collsplit localizes the 262k superlinearity to layout+kernel (80.6 of
113.8 ms vs ~25.5 at 131k — VERDICT round-3 weak item 1); this pins it to
a STAGE: cell sort, feats build, strips gather, strip transpose, fused
chunk gather, target gather, kernel, epilogue merge. Each stage is timed
by the warmed-scan slope (CLAUDE.md methodology) on a scan whose carry
nudges positions so iterations form a data chain, with the output reduced
to a scalar before materialization (a 50 MB stage output would otherwise
time the tunnel readback, not the stage).

    env PYTHONPATH=/root/repo:/root/.axon_site python -m nbx.bench.layoutsplit \
        [N1,N2] [cfg1] [cfg2]
    # defaults: 131072,262144 32,8 40,8   (g,B per N; caps via u0.8)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbx.bench.granular import BOX, granular_cloud
from nbx.config import SimConfig, body_radius
from nbx.ops.collide import (
    LANE, _body_feats, _collide_kernel_fused, _column_neighbors,
    _invert_order, _round_up, bucketed_layout_for,
)
from nbx.ops.p3m import cell_sort, take_rows

S_SHORT, S_LONG = 3, 12


def _time(run):
    run(S_SHORT)
    run(S_LONG)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(S_SHORT)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(S_LONG)
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (S_LONG - S_SHORT))
    return best * 1e3


def _stage_scans(pos0, vel, mass, radius, box, g, band, buckets):
    """Jitted per-stage scan runners for the BULK bucket's construction
    (the whole-grid strips path of _packed_bucketed_blocks, kept in sync
    by hand — this is a measurement probe, not a third implementation)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pos0.shape[0]
    b = band
    n_cols = g * g
    g3 = n_cols * g
    n_bands = -(-g // b)
    t_cap, s_cap, bmax = buckets[0]
    t_rows = _round_up(max(t_cap, 8), 8)
    s_capw = max(s_cap, 8)
    s_rows = _round_up(9 * s_capw, LANE)
    i32 = jnp.int32
    f32 = jnp.float32
    neigh = _column_neighbors(g)
    cols = jnp.arange(n_cols, dtype=i32)
    w_r = jnp.arange(n_bands, dtype=i32)
    lo = jnp.maximum(w_r * b - 1, 0)
    hi = jnp.minimum(w_r * b + b + 1, g)

    def nudge(p, x):
        return p + (x % 7).astype(f32)[:, None] * 1e-7

    def upto(stage):
        """One evaluation of the construction through `stage`; returns a
        scalar data-dependent on every built table."""

        def f(p):
            feats = _body_feats(p, vel, mass, radius, box)
            order, starts, cid_sorted = cell_sort(p, box, g)
            if stage == "sort":
                return jnp.sum(starts), order
            feats_sorted = jnp.concatenate([feats[order], feats[n:]], 0)
            if stage == "feats":
                return jnp.sum(feats_sorted[:, 0]), order
            ts_tab = starts[cols[:, None] * g + w_r[None, :] * b]
            cnt_t = starts[
                cols[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
            ] - ts_tab
            p_r = jnp.arange(n, dtype=i32)
            col_s = cid_sorted // g
            w_own = (cid_sorted - col_s * g) // b
            rank_t = p_r - ts_tab[col_s, w_own]
            ok_sorted = rank_t < t_rows
            t_ok = jnp.concatenate([ok_sorted, jnp.zeros((1,), bool)])
            ar_s = jnp.arange(s_capw, dtype=i32)
            ss_own = starts[cols[:, None] * g + lo[None, :]]
            se_own = starts[cols[:, None] * g + hi[None, :]]
            valid_so = (
                ar_s[None, None, :]
                < jnp.minimum(se_own - ss_own, s_capw)[..., None]
            )
            take_so = jnp.minimum(ss_own[..., None] + ar_s, n)
            strips = feats_sorted[
                jnp.where(valid_so & t_ok[take_so], take_so, n)
            ]
            if stage == "strips":
                return jnp.sum(strips[..., 0]), order
            stripsT = strips.transpose(0, 1, 3, 2)
            dead = jnp.broadcast_to(
                feats[n][:, None], (1, n_bands, 16, s_capw))
            stripsT = jnp.concatenate([stripsT, dead], axis=0)
            if stage == "transpose":
                return jnp.sum(stripsT[..., 0]), order
            wsel, wvalid = take_rows(
                (cnt_t > 0).reshape(-1), bmax)
            col_sel = wsel // n_bands
            w_sel = wsel - col_sel * n_bands
            fused = stripsT[neigh[col_sel], w_sel[:, None]]
            src = fused.transpose(0, 2, 1, 3).reshape(bmax, 16, 9 * s_capw)
            lane_pad = jnp.broadcast_to(
                feats[n][:, None], (bmax, 16, s_rows - 9 * s_capw))
            src = jnp.concatenate([src, lane_pad], 2).reshape(-1, s_rows)
            if stage == "fused":
                return jnp.sum(src[:, 0]), order
            ts_sel = ts_tab[col_sel, w_sel]
            cnt_sel = jnp.where(wvalid, cnt_t[col_sel, w_sel], 0)
            ar_t = jnp.arange(t_rows, dtype=i32)
            valid_t = ar_t[None, :] < jnp.minimum(cnt_sel, t_rows)[:, None]
            take_t = jnp.minimum(ts_sel[:, None] + ar_t, n)
            tgt = feats_sorted[
                jnp.where(valid_t, take_t, n)].reshape(-1, 16)
            if stage == "tgt":
                return jnp.sum(tgt[:, 0]) + jnp.sum(src[:, 0]), order
            par = jnp.asarray([[0.2, 0.5]], f32)
            delta, evt = pl.pallas_call(
                _collide_kernel_fused,
                grid=(bmax,),
                in_specs=[
                    pl.BlockSpec((1, 2), lambda c: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((t_rows, 16), lambda c: (c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, s_rows), lambda c: (c, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((t_rows, 8), lambda c: (c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t_rows, 8), lambda c: (c, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((bmax * t_rows, 8), f32),
                    jax.ShapeDtypeStruct((bmax * t_rows, 8), f32),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=60 * bmax * t_rows * s_rows,
                    bytes_accessed=(bmax * (t_rows * 16 + s_rows * 16
                                            + t_rows * 16)) * 4,
                    transcendentals=bmax * t_rows * s_rows,
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                interpret=False,
            )(par, tgt, src)
            if stage == "kernel":
                return jnp.sum(delta[:, 0]), order
            inv = _invert_order(order, n)
            f_own = col_s * n_bands + w_own
            wrank = jnp.cumsum((cnt_t > 0).reshape(-1).astype(i32)) - 1
            slot_sorted = jnp.where(
                ok_sorted & (wrank[f_own] < bmax),
                wrank[f_own] * t_rows + rank_t, bmax * t_rows)
            body_slot = slot_sorted[inv]
            delta_p = jnp.concatenate(
                [delta, jnp.zeros((1, 8), f32)], 0)
            out_d = delta_p[body_slot]
            return jnp.sum(out_d[:, 0]), order

        @functools.partial(jax.jit, static_argnames=("steps",))
        def scan(p, steps: int):
            def body(carry, _):
                p = carry
                s, order = f(p)
                return nudge(p, order) + s * 1e-20, None

            out, _ = jax.lax.scan(body, p, None, length=steps)
            return out

        return scan

    return upto


def main(argv):
    ns = [int(x) for x in (argv[0] if argv else
                           "131072,262144").split(",")]
    cfgs = argv[1:] or ["32,8", "40,8"]
    stages = ["sort", "feats", "strips", "transpose", "fused", "tgt",
              "kernel", "epilogue"]
    for n_bodies, cfg_s in zip(ns, cfgs):
        g, band = (int(x) for x in cfg_s.split(","))
        box = BOX * (n_bodies / 131072.0) ** (1.0 / 3.0)
        pos, vel, mass = granular_cloud(n_bodies, box=box)
        pos = jnp.asarray(pos)
        vel = jnp.asarray(vel)
        mass = jnp.asarray(mass)
        cfg = SimConfig()
        radius = body_radius(mass, jnp.zeros(n_bodies, jnp.int32),
                             cfg.materials)
        buckets = bucketed_layout_for(pos, box, g, band,
                                      split_quantile=0.8)
        upto = _stage_scans(pos, vel, mass, radius, box, g, band, buckets)
        out = {"n": n_bodies, "g": g, "band": band,
               "bucket0": buckets[0], "n_buckets": len(buckets)}
        prev = 0.0
        for st in stages:
            scan = upto(st)
            ms = _time(lambda s: np.asarray(scan(pos, s)))
            out[f"ms_{st}"] = round(ms, 2)
            out[f"d_{st}"] = round(ms - prev, 2)
            prev = ms
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
