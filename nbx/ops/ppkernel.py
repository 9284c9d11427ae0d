"""Pallas short-range PP kernel for P3M — the erfc pair pass on VMEM tiles.

The XLA 27-offset short-range path (nbx.ops.p3m.short_range_acc) tops out
at ~1.7e9 erfc-pairs/s on v5e: each offset materializes [chunk, K, K, 3]
HBM temporaries, so the pass is HBM-bound. This kernel streams the same
pair work through VMEM blocks instead (the band-packed collision layout's
proven recipe, nbx.ops.collide): one program per CELL, targets = the
cell's kept bodies as a [K, 8] block, sources = the 27-neighborhood's
kept bodies fused into one [8, 27 K] block by chunk gathers off the cell
sort. ~25 VPU ops + 1 exp per pair lane, no HBM temporaries.

KEPT-SET PARITY: the kernel evaluates exactly the first-`max_per_cell`
bodies per cell in cell-sorted order — the same kept set as
nbx.ops.p3m.cell_bin_full — so p3m_acceleration's adaptive residual
machinery (overflowing bodies vs the kept table + residual-residual) is
bit-for-bit the same bookkeeping whichever implementation computes the
main pass.

erfc inside the kernel uses the Abramowitz & Stegun 7.1.26 polynomial
(|abs err| <= 1.5e-7, t = 1/(1 + 0.3275911 x)), sharing the exp(-x^2)
the force law needs anyway — Mosaic has exp; erf/erfc availability is
not relied on.

Why this unlocks P3M accuracy at scale: the mesh must resolve the
smoothing scale (h <= a/1.7, p3m.py docstring) and a = cell/3, so the
accurate regime needs FEWER, BIGGER cells (n_cells <= g/5.1) — i.e. far
more pairs per body (measured core error 3.1e-2 at the round-2 tune
g=64/n_cells=25, where a/h = 0.85). At n_cells=12, K~700 the pair count
(~2e10) is hopeless on the XLA path (~12 s) and routine here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbx.ops.p3m import cell_sort

LANE = 128
# S-chunk loop unroll bound: small neighborhoods (the collision-kernel
# regime) unroll; big ones (accurate P3M tunes, K ~ 700 -> 100+ chunks)
# run a fori_loop so Mosaic's register allocator doesn't spill the
# unrolled live set to VMEM (170 MB of spill slots at 162 chunks).
_UNROLL_CHUNKS = 16

# Abramowitz & Stegun 7.1.26 erfc coefficients (x >= 0, abs err 1.5e-7)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pp_kernel(par_ref, tgt_ref, src_ref, out_ref):
    """One target sub-block of a cell vs the cell's fused 27-cell source
    neighborhood (grid = (cells, k8 // t_sub); the src block's index map
    is constant along the sub-block axis, so it is fetched once per cell).

    par_ref [1, 4] SMEM: eps2, inv_a, c_a (= 2/(a sqrt(pi))), G
    tgt_ref [T, 8]      target rows: x y z m 0 0 0 0
    src_ref [8, S]      fused neighborhood, lanes = bodies (dead-padded:
                        mass 0, parked far away)
    out_ref [T, 8]      = ax ay az 0 0 0 0 0

    Force law (p3m.py module docstring):
        acc_i += G m_j [erfc(x)/s^3 + c_a exp(-x^2)/s^2] d,
        x = s/a, s = sqrt(r^2 + eps^2), d = p_j - p_i.

    The S axis is processed in 128-lane chunks with LANE-WISE [T, chunk]
    accumulators and ONE cross-lane reduction after the loop: the
    earlier running-[K, 1] form paid 3 cross-lane reductions per chunk
    (~log2(128) shuffle-adds each), which at the accurate P3M tune
    (162 chunks) rivaled the pair math itself. Few chunks are unrolled;
    past _UNROLL_CHUNKS the loop becomes a lax.fori_loop — at K=768 full
    unrolling blew Mosaic's register allocator into 170 MB of VMEM spill
    slots ("Ran out of memory in memory space vmem ... register allocator
    spill slots", measured round 3).
    """
    eps2 = par_ref[0, 0]
    inv_a = par_ref[0, 1]
    c_a = par_ref[0, 2]
    g_sc = par_ref[0, 3]

    t = tgt_ref[:]
    xi, yi, zi = t[:, 0:1], t[:, 1:2], t[:, 2:3]

    s_rows = src_ref.shape[1]
    chunk = LANE if s_rows % LANE == 0 else s_rows
    n_chunks = s_rows // chunk

    def visit(c, carry):
        ax, ay, az = carry
        s = src_ref[:, pl.ds(c * chunk, chunk)]
        xj, yj, zj, mj = s[0:1, :], s[1:2, :], s[2:3, :], s[3:4, :]

        dx = xj - xi  # [T, chunk] i -> j
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz
        s2 = r2 + eps2
        inv_s = jax.lax.rsqrt(jnp.where(s2 > 0.0, s2, 1.0))
        sdist = s2 * inv_s  # sqrt(s2), 0 at s2 == 0
        x = sdist * inv_a
        ex2 = jnp.exp(-x * x)
        # A&S 7.1.26: erfc(x) = t (a1 + t (a2 + t (a3 + t (a4 + t a5)))) e^-x^2
        tt = 1.0 / (1.0 + _AS_P * x)
        poly = _AS_A[4]
        for a_k in (_AS_A[3], _AS_A[2], _AS_A[1], _AS_A[0]):
            poly = poly * tt + a_k
        erfc_x = poly * tt * ex2
        # w = m_j (erfc/s + c_a e^-x^2) / s^2; self/coincident pairs and
        # dead lanes masked exactly like the XLA path (r2 > 0 & m_j > 0)
        w = jnp.where(
            (r2 > 0.0) & (mj > 0.0),
            mj * (erfc_x * inv_s + c_a * ex2) * (inv_s * inv_s),
            0.0,
        )
        return ax + w * dx, ay + w * dy, az + w * dz

    acc0 = (jnp.zeros((t.shape[0], chunk), t.dtype),) * 3
    if n_chunks <= _UNROLL_CHUNKS:
        ax, ay, az = acc0
        for c in range(n_chunks):
            ax, ay, az = visit(c, (ax, ay, az))
    else:
        ax, ay, az = jax.lax.fori_loop(0, n_chunks, visit, acc0)

    ax = jnp.sum(ax, axis=1, keepdims=True)
    ay = jnp.sum(ay, axis=1, keepdims=True)
    az = jnp.sum(az, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    out_ref[:] = jnp.concatenate(
        [g_sc * ax, g_sc * ay, g_sc * az, zero, zero, zero, zero, zero],
        axis=1,
    )


def _cell_neighbors27(g: int):
    """[g^3, 27] cell ids of the 3^3 neighborhood; out-of-box -> g^3 (the
    dead cell). Static arithmetic — no scatters, no host loops over cells."""
    cc = jnp.arange(g * g * g, dtype=jnp.int32)
    ci = cc // (g * g)
    cj = (cc // g) % g
    ck = cc % g
    cols = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                ni, nj, nk = ci + di, cj + dj, ck + dk
                ok = (
                    (ni >= 0) & (ni < g) & (nj >= 0) & (nj < g)
                    & (nk >= 0) & (nk < g)
                )
                cid = (jnp.clip(ni, 0, g - 1) * g
                       + jnp.clip(nj, 0, g - 1)) * g + jnp.clip(nk, 0, g - 1)
                cols.append(jnp.where(ok, cid, g * g * g))
    return jnp.stack(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("n_cells", "max_per_cell", "interpret"),
)
def short_range_acc_pallas(
    pos, mass, G, a, box_size: float, n_cells: int,
    max_per_cell: int = 16, eps=0.0, interpret: bool = False,
):
    """Drop-in Pallas replacement for nbx.ops.p3m.short_range_acc.

    Same contract: ([N, 3] acc, n_overflow), same kept set (first
    max_per_cell bodies per cell in cell-sorted order), same neighborhood
    (3^3 cells, face cells see fewer), same pair mask (r2 > 0, m_j > 0).
    Differences are floating-point only: erfc via the A&S 7.1.26
    polynomial (abs err <= 1.5e-7) and a different reduction order.

    Layout (the band-packed collision recipe, nbx.ops.collide):
      targets   feats_sorted chunk-gathered per cell  -> [C, K8, 8]
      sources   per-cell blocks transposed + gathered at the 27 neighbor
                ids (contiguous [8, K8] copies)       -> [C, 8, 27 K8]
      epilogue  out[cell, rank] gathered back through the inverse sort
                permutation — slot is a FUNCTION of the sort, no scatter.
    """
    n = pos.shape[0]
    g = n_cells
    k = max_per_cell
    c_total = g * g * g
    i32 = jnp.int32
    f32 = jnp.float32

    order, starts, cid_sorted = cell_sort(pos, box_size, g)
    cnt = starts[1:] - starts[:-1]  # [C]
    n_overflow = jnp.sum(jnp.maximum(cnt - k, 0))

    # [N + 1, 8] features in cell order; row n = dead padding (mass 0,
    # parked out of the box so even unmasked lanes are force-free)
    feats_sorted = jnp.concatenate(
        [
            jnp.concatenate(
                [pos[order], mass[order][:, None],
                 jnp.zeros((n, 4), f32)], axis=1,
            ),
            jnp.concatenate(
                [jnp.full((1, 3), 2.0 * box_size, f32),
                 jnp.zeros((1, 5), f32)], axis=1,
            ),
        ],
        axis=0,
    )

    k8 = _round_up(max(k, 8), 8)
    if k8 > LANE:  # 2D-grid sub-blocks must tile k8 exactly
        k8 = _round_up(k8, LANE)
    t_sub = min(k8, LANE)
    ar = jnp.arange(k8, dtype=i32)
    base = starts[:c_total]
    valid = ar[None, :] < jnp.minimum(cnt, k)[:, None]  # [C, K8]
    take = jnp.minimum(base[:, None] + ar, n)
    # the ONE per-row gather: consecutive-run rows per cell (3D index form
    # — the flat 1D-index gather measured 4x slower, nbx/ops/collide.py)
    tgt = feats_sorted[jnp.where(valid, take, n)]  # [C, K8, 8]

    # fused sources: [C + 1, 8, K8] blocks chunk-gathered at 27 neighbors
    blocksT = jnp.concatenate(
        [
            tgt.transpose(0, 2, 1),
            jnp.broadcast_to(feats_sorted[n][None, :, None], (1, 8, k8)),
        ],
        axis=0,
    )
    neigh = _cell_neighbors27(g)  # [C, 27]
    fused = blocksT[neigh]  # [C, 27, 8, K8] — contiguous (8 K8)-float copies
    fused = fused.transpose(0, 2, 1, 3).reshape(c_total, 8, 27 * k8)
    s_rows = _round_up(27 * k8, LANE)
    if s_rows != 27 * k8:
        lane_pad = jnp.broadcast_to(
            feats_sorted[n][None, :, None],
            (c_total, 8, s_rows - 27 * k8),
        )
        fused = jnp.concatenate([fused, lane_pad], axis=2)
    src = fused.reshape(c_total * 8, s_rows)

    a32 = jnp.asarray(a, f32)
    par = jnp.stack(
        [
            jnp.asarray(eps, f32) ** 2,
            1.0 / a32,
            2.0 / (a32 * jnp.sqrt(jnp.pi).astype(f32)),
            jnp.asarray(G, f32),
        ]
    )[None, :]

    pair_ops = 25
    n_sub = k8 // t_sub  # target sub-blocks per cell; ts is the FAST grid
    # axis so the [8, S] src block (index constant in ts) loads once/cell
    out = pl.pallas_call(
        _pp_kernel,
        grid=(c_total, n_sub),
        in_specs=[
            pl.BlockSpec((1, 4), lambda c, ts: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t_sub, 8), lambda c, ts: (c * n_sub + ts, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s_rows), lambda c, ts: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_sub, 8), lambda c, ts: (c * n_sub + ts, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_total * k8, 8), f32),
        cost_estimate=pl.CostEstimate(
            flops=pair_ops * c_total * k8 * s_rows,
            bytes_accessed=(c_total * (k8 * 8 * 2 + s_rows * 8)) * 4,
            transcendentals=c_total * k8 * s_rows,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(par, tgt.reshape(c_total * k8, 8), src)

    # epilogue: body -> its (cell, rank) slot, pure gathers (slot is a
    # function of the cell sort; kept-dropped bodies hit the zero pad row)
    p_r = jnp.arange(n, dtype=i32)
    rank = p_r - starts[cid_sorted]
    slot_sorted = jnp.where(
        rank < k, cid_sorted * k8 + rank, c_total * k8
    )
    inv = jnp.argsort(order).astype(i32)  # no N-scatter (microops)
    out_p = jnp.concatenate([out, jnp.zeros((1, 8), f32)], axis=0)
    acc = out_p[slot_sorted[inv], :3]
    return acc, n_overflow
