"""Pallas TPU kernel for O(N^2) softened pairwise gravity — the hot loop.

Physics: the reference's computeGravity (/root/reference/index.html:264-291),
Plummer softening f = G * (d^2 + eps^2)^(-3/2), acc_i = sum_j f_ij m_j (p_j - p_i).

TPU-first design (NOT a translation of the scalar JS pair loop):

  * The i-j interaction tile is computed as 2D [TILE_I, TILE_J] vector work:
    dx/dy/dz by broadcast-subtract between a [TILE_I, 1] target column and a
    [1, TILE_J] source row, then one fused rsqrt^3 chain on the VPU.
  * DEFAULT ('f32r'): the force accumulation is a direct f32 VPU row
    reduction of w * dx — measured both FASTEST and most accurate on v5e.
    We also built the textbook MXU alternative ('f32': mass-folded source
    matrix S = [m x, m y, m z, m], acc from F @ S) and measured it slower
    AND less accurate here: Mosaic's exact-f32 matmul is a 6-pass bf16
    emulation, and the mass-folded form is a catastrophic cancellation that
    amplifies matmul rounding by |x|/|dx|. Both kept (with 'fast'/'bf16')
    as the documented precision/speed study.
  * The self-interaction (i == j on the diagonal tiles) cancels EXACTLY in
    all formulations (w_ii * dx_ii = finite * 0), finite for eps > 0 —
    no diagonal masking needed (the dense jnp oracle masks instead).
  * Padding bodies carry mass 0, so they contribute zero force; padded
    target rows compute garbage that is sliced away.
  * Output [TILE_I, 8] accumulates in VMEM across the j grid dimension
    (revisited block), G applied once in the j == last epilogue.

Supports rectangular problems (targets != sources) for the sharded path
where each chip computes all-source forces on its local body shard
(nbx.parallel.shard).

Requires eps > 0 (the reference default is 0.5; eps == 0 direct sum is
undefined on the diagonal — use nbx.forces.accelerations which masks it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _acc_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """Grid (n_i, n_j), j minor. Blocks:
    tgt_ref [TILE_I, 8]  target x,y,z in cols 0-2
    src_ref [8, TILE_J]  source x,y,z in rows 0-2
    s_ref   [TILE_J, 8]  mass-folded sources [m x, m y, m z, m, 0...]
    out_ref [TILE_I, 8]  acc x,y,z in cols 0-2 (epilogue), col 3 = sum f m
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]  # [TI, 1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    dx = src_ref[0:1, :] - xi  # [TI, TJ] broadcast-subtract
    dy = src_ref[1:2, :] - yi
    dz = src_ref[2:3, :] - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2_ref[0, 0]
    inv = jax.lax.rsqrt(r2)
    f = inv * inv * inv  # (d^2 + eps^2)^(-3/2), G deferred to epilogue
    # precision=HIGHEST: Mosaic's default f32 "matmul" is one-pass bf16
    # (~3e-3 relative error — measured); the 6-pass f32 emulation is exact to
    # f32 and the MXU has ~7x headroom over the VPU rsqrt-chain bottleneck.
    out_ref[:] += jnp.dot(
        f,
        s_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == n_j - 1)
    def _():
        o = out_ref[:]
        g = g_ref[0, 0]
        w = o[:, 3:4]  # sum_j f m_j
        acc = (o[:, 0:4] - jnp.concatenate([xi, yi, zi, jnp.zeros_like(xi)], 1) * w) * g
        out_ref[:] = jnp.concatenate([acc, jnp.zeros_like(acc)], axis=1)


def _fast_acc_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """Fast variant: hand-rolled 3-pass bf16 matmul + per-tile source
    centering (Mosaic supports only DEFAULT/HIGHEST dot precision; HIGHEST
    is a 6-pass emulation, measured 2.2x slower end-to-end).

    Two accuracy tricks stack:
      1. Centering. The mass-folded accumulation
         a_i = sum(f m x_j) - x_i sum(f m) amplifies matmul rounding by
         |x_scale / dx_scale| (two large near-equal sums). Centering sources
         at their tile centroid c makes the matmul operate on small
         quantities m (x_j - c); the exact identity
             sum f m x_j = dot(f, m (x - c)) + c * sum(f m)
         restores the uncentered sum with f32 scalar work only.
      2. 3-pass bf16: split both operands into bf16 hi + lo halves and take
         the three significant products (hi hi + hi lo + lo hi), each a
         native bf16 MXU pass with f32 accumulation — ~1.5e-5 product error
         vs ~4e-3 for one pass, at half the passes of HIGHEST.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    xj = src_ref[0:1, :]
    yj = src_ref[1:2, :]
    zj = src_ref[2:3, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2_ref[0, 0]
    inv = jax.lax.rsqrt(r2)
    f = inv * inv * inv
    cx = jnp.mean(xj, axis=1, keepdims=True)  # [1, 1] (rank-0 reductions
    cy = jnp.mean(yj, axis=1, keepdims=True)  # are fragile in Mosaic)
    cz = jnp.mean(zj, axis=1, keepdims=True)
    m = s_ref[:, 3:4]  # [TJ, 1]
    zero_col = jnp.zeros_like(m)
    center = jnp.concatenate(
        [cx * m, cy * m, cz * m, zero_col, zero_col, zero_col, zero_col, zero_col], 1
    )
    s_c = s_ref[:] - center
    bf16 = jnp.bfloat16
    s_hi = s_c.astype(bf16)
    s_lo = (s_c - s_hi.astype(jnp.float32)).astype(bf16)
    f_hi = f.astype(bf16)
    f_lo = (f - f_hi.astype(jnp.float32)).astype(bf16)
    # explicit DEFAULT precision: bf16 operands must use the native bf16
    # contract — a global jax_default_matmul_precision=highest (e.g. set by
    # a test harness) would otherwise request an fp32 contract on bf16
    # vectors, which Mosaic rejects at compile time
    dot = lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    tmp = dot(f_hi, s_hi) + dot(f_hi, s_lo) + dot(f_lo, s_hi)
    w = tmp[:, 3:4]  # sum_j f m_j for this tile
    zero = jnp.zeros_like(w)
    out_ref[:] += tmp + jnp.concatenate(
        [cx * w, cy * w, cz * w, zero, zero, zero, zero, zero], 1
    )

    @pl.when(j == n_j - 1)
    def _():
        o = out_ref[:]
        g = g_ref[0, 0]
        w = o[:, 3:4]
        acc = (o[:, 0:4] - jnp.concatenate([xi, yi, zi, jnp.zeros_like(xi)], 1) * w) * g
        out_ref[:] = jnp.concatenate([acc, jnp.zeros_like(acc)], axis=1)


def _f32r_acc_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """Exact-f32 VPU-reduction variant: accumulate sum_j w dx directly with
    f32 row reductions — no MXU, no cancellation, no multi-pass emulation.
    ~19 VPU ops/pair instead of 12 + 6 MXU passes; wins when the 6-pass
    HIGHEST matmul is the bottleneck."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    dx = src_ref[0:1, :] - xi
    dy = src_ref[1:2, :] - yi
    dz = src_ref[2:3, :] - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2_ref[0, 0]
    inv = jax.lax.rsqrt(r2)
    w = inv * inv * inv * src_ref[3:4, :]  # f * m_j
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    out_ref[:] += jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], 1)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = out_ref[:] * g_ref[0, 0]


def _mxu_acc_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """MXU-r^2 prototype (ROADMAP 'kernel headroom'): move the pair work the
    VPU spends on dx/dy/dz + squares onto the MXU via the centered identity

        r^2_ij = |p_i - c|^2 + |p_j - c|^2 - 2 (p_i - c).(p_j - c)

    with c the source-tile centroid. The cross term is a [TI, 8] @ [8, TJ]
    matmul — SMALL operands, so the 6-pass HIGHEST emulation's per-element
    decomposition cost amortizes to ~0 per pair (unlike a [TI, TJ] operand).
    The force accumulation sum_j w (p_j - p_i) = dot(w, P_c) - p_ic sum_j w
    runs as a 3-pass bf16 matmul over the centered source matrix (small
    values -> no cancellation; the 'fast' kernel's trick).

    Accuracy caveat: the r^2 cancellation amplifies f32 rounding by
    (tile_spread / dx)^2 — needs spatially ordered bodies (Morton) to be
    competitive with f32r's 2.3e-6; measured numbers in docs/RESULTS.md.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    xj = src_ref[0:1, :]
    yj = src_ref[1:2, :]
    zj = src_ref[2:3, :]
    m = src_ref[3:4, :]
    cx = jnp.mean(xj, axis=1, keepdims=True)  # [1, 1] source-tile centroid
    cy = jnp.mean(yj, axis=1, keepdims=True)
    cz = jnp.mean(zj, axis=1, keepdims=True)
    xic, yic, zic = xi - cx, yi - cy, zi - cz  # [TI, 1]
    xjc, yjc, zjc = xj - cx, yj - cy, zj - cz  # [1, TJ]

    # cross term on the MXU: A [TI, 8] (centered target coords in cols 0-2),
    # B [8, TJ] (centered source coords in rows 0-2, zeros elsewhere)
    zero_i = jnp.zeros_like(xic)
    a_mat = jnp.concatenate(
        [xic, yic, zic, zero_i, zero_i, zero_i, zero_i, zero_i], axis=1
    )
    zero_j = jnp.zeros_like(xjc)
    b_mat = jnp.concatenate(
        [xjc, yjc, zjc, zero_j, zero_j, zero_j, zero_j, zero_j], axis=0
    )
    cross = jnp.dot(
        a_mat, b_mat,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TI, TJ]
    ti2 = xic * xic + yic * yic + zic * zic  # [TI, 1]
    tj2 = xjc * xjc + yjc * yjc + zjc * zjc  # [1, TJ]
    r2 = ti2 + tj2 - 2.0 * cross + eps2_ref[0, 0]
    r2 = jnp.maximum(r2, eps2_ref[0, 0])  # cancellation floor
    inv = jax.lax.rsqrt(r2)
    w = inv * inv * inv * m  # [TI, TJ] f * m_j

    # accumulation matmul: dot(w, P_c) with P_c [TJ, 8] = centered source
    # coords + a ones column; 3-pass bf16 split of w (small relative error,
    # no cancellation: P_c values are tile-local)
    bf16 = jnp.bfloat16
    w_hi = w.astype(bf16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(bf16)
    ones_col = jnp.ones_like(s_ref[:, 0:1])
    zc8 = jnp.zeros_like(ones_col)
    # s_ref carries RAW source coords in cols 0-2 (see wrapper); center them
    p_c = jnp.concatenate(
        [
            s_ref[:, 0:1] - cx[0, 0],
            s_ref[:, 1:2] - cy[0, 0],
            s_ref[:, 2:3] - cz[0, 0],
            ones_col, zc8, zc8, zc8, zc8,
        ],
        axis=1,
    )
    p_hi = p_c.astype(bf16)
    p_lo = (p_c - p_hi.astype(jnp.float32)).astype(bf16)
    dot = lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    tmp = dot(w_hi, p_hi) + dot(w_hi, p_lo) + dot(w_lo, p_hi)  # [TI, 8]
    # sum_j w (p_j - p_i) = tmp[:, 0:3] - p_ic * tmp[:, 3]
    wsum = tmp[:, 3:4]
    zero = jnp.zeros_like(wsum)
    out_ref[:] += jnp.concatenate(
        [
            tmp[:, 0:1] - xic * wsum,
            tmp[:, 1:2] - yic * wsum,
            tmp[:, 2:3] - zic * wsum,
            zero, zero, zero, zero, zero,
        ],
        axis=1,
    )

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = out_ref[:] * g_ref[0, 0]


def _hyb_acc_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """HYBRID MXU-r^2 / VPU-accumulation variant (round 3): the second
    attempt at ROADMAP 'kernel headroom', informed by why 'mxu' lost.

    The 'mxu' prototype moved BOTH the r^2 distance work and the force
    accumulation onto the MXU and measured 2.4x SLOWER than f32r: the
    accumulation matmul needs [TI, TJ]-shaped bf16 hi/lo operand splits
    (3 extra [TI, TJ] VPU ops + materialized bf16 copies), which cost more
    than the VPU dx chain they replaced. This kernel keeps ONLY the cheap
    half of that trade:

      * r^2 via the centered identity
            r^2_ij = |p_i - c|^2 + |p_j - c|^2 - 2 (p_i - c).(p_j - c)
        with the cross term a [TI, 8] @ [8, TJ] HIGHEST matmul — operands
        are SMALL (8-deep), so the 6-pass f32-exact emulation's
        decomposition cost amortizes to ~0 per pair, and the MXU output
        lands as a plain f32 [TI, TJ] block for the VPU. This deletes the
        dx/dy/dz subtract + square chain (9 [TI, TJ] VPU ops -> ~3).
      * accumulation stays pure-VPU f32 row reductions, but in the
        CENTERED mass-folded form: sum_j w (p_j - p_i) =
        sum_j w (p_j - c) + (c - p_i) sum_j w. The per-pair cost is
        4 muls + 4 reductions (vs f32r's 3 + w-fold + 3 + 3); no bf16
        splits, no cancellation at box scale (operands are tile-centered).

    Net [TI, TJ] VPU work: ~14 ops/pair vs f32r's 19 -> bound ~2.5e11
    pairs/s if VPU-bound and the cross matmul overlaps. MEASURED (round 3,
    same process, same (1024, 2048) tiles): 1.161e11 vs f32r's 1.538e11 —
    1.32x SLOWER. The 6-pass HIGHEST cross matmul does not overlap away:
    at 8-deep contraction the MXU runs at 8/128 utilization x 6 passes,
    so the "free" matmul costs more than the 5 VPU ops it saves. Second
    negative for the MXU-r^2 family (after 'mxu', round 2) — kept as a
    documented study variant; do not use in production.

    Accuracy caveat (same class as 'mxu', measured there at 1.8e-3): the
    centered-square cancellation amplifies f32 rounding by
    (tile_spread / r)^2, floored by eps — a precision/speed STUDY variant
    like 'fast'/'bf16'; f32r remains the exact default.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    xj = src_ref[0:1, :]
    yj = src_ref[1:2, :]
    zj = src_ref[2:3, :]
    m = src_ref[3:4, :]
    cx = jnp.mean(xj, axis=1, keepdims=True)  # [1, 1] source-tile centroid
    cy = jnp.mean(yj, axis=1, keepdims=True)
    cz = jnp.mean(zj, axis=1, keepdims=True)
    xic, yic, zic = xi - cx, yi - cy, zi - cz  # [TI, 1]
    xjc, yjc, zjc = xj - cx, yj - cy, zj - cz  # [1, TJ]

    # cross term on the MXU: [TI, 8] @ [8, TJ] -> [TI, TJ] f32
    zero_i = jnp.zeros_like(xic)
    a_mat = jnp.concatenate(
        [xic, yic, zic, zero_i, zero_i, zero_i, zero_i, zero_i], axis=1
    )
    zero_j = jnp.zeros_like(xjc)
    b_mat = jnp.concatenate(
        [xjc, yjc, zjc, zero_j, zero_j, zero_j, zero_j, zero_j], axis=0
    )
    cross = jnp.dot(
        a_mat, b_mat,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TI, TJ]

    ti2 = xic * xic + yic * yic + zic * zic  # [TI, 1], amortized over TJ
    tj2e = xjc * xjc + yjc * yjc + zjc * zjc + eps2_ref[0, 0]  # [1, TJ]
    r2 = (ti2 + tj2e) - 2.0 * cross  # ~2-3 [TI, TJ] VPU ops
    r2 = jnp.maximum(r2, eps2_ref[0, 0])  # cancellation floor
    inv = jax.lax.rsqrt(r2)
    inv3 = inv * inv * inv
    w = inv3 * m  # [TI, TJ] f * m_j
    # centered mass-folded reductions: 3 muls + 4 row sums
    sx = jnp.sum(w * xjc, axis=1, keepdims=True)
    sy = jnp.sum(w * yjc, axis=1, keepdims=True)
    sz = jnp.sum(w * zjc, axis=1, keepdims=True)
    sw = jnp.sum(w, axis=1, keepdims=True)
    # un-center per j-tile ([TI, 1] epilogue, amortized):
    # sum_j w (p_j - p_i) = s + (c - p_i) sum_w = s - p_ic * sum_w
    ax = sx - xic * sw
    ay = sy - yic * sw
    az = sz - zic * sw
    zero = jnp.zeros_like(ax)
    out_ref[:] += jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], 1)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = out_ref[:] * g_ref[0, 0]


def _bf16_acc_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """bf16-pairwise variant (the precision-study configuration, BASELINE
    config 4): displacements and the force weight in bfloat16, row reduction
    accumulated in f32 on the VPU.

    Deliberately NOT the mass-folded MXU form of the f32 kernel: that form
    computes a_i = sum(f m x_j) - x_i sum(f m), a catastrophic cancellation
    of two large near-equal sums — fine in f32 (measured ~1e-4), fatal with
    bf16 products (measured ~5x relative error). Here the small quantity dx
    is formed FIRST, so bf16 rounding applies to already-cancelled values and
    the error stays at the bf16 epsilon scale (~1e-2).
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    dx = (src_ref[0:1, :] - xi).astype(jnp.bfloat16)
    dy = (src_ref[1:2, :] - yi).astype(jnp.bfloat16)
    dz = (src_ref[2:3, :] - zi).astype(jnp.bfloat16)
    f32 = jnp.float32
    r2 = (
        (dx * dx).astype(f32)
        + (dy * dy).astype(f32)
        + (dz * dz).astype(f32)
        + eps2_ref[0, 0]
    )
    inv = jax.lax.rsqrt(r2)
    # w = m_j * (d^2+eps^2)^(-3/2) in bf16; s_ref row 3 carries the mass
    w = (inv * inv * inv).astype(jnp.bfloat16) * src_ref[3:4, :].astype(jnp.bfloat16)
    ax = jnp.sum((w * dx).astype(f32), axis=1, keepdims=True)
    ay = jnp.sum((w * dy).astype(f32), axis=1, keepdims=True)
    az = jnp.sum((w * dz).astype(f32), axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    out_ref[:] += jnp.concatenate([ax, ay, az, zero, zero, zero, zero, zero], 1)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = out_ref[:] * g_ref[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("tile_i", "tile_j", "precision", "interpret"),
)
def pairwise_acc(
    pos: jax.Array,
    mass: jax.Array,
    G,
    softening,
    target_pos: jax.Array | None = None,
    tile_i: int = 1024,
    tile_j: int = 2048,
    precision: str = "f32r",
    interpret: bool = False,
) -> jax.Array:
    """Softened gravitational acceleration via the Pallas kernel.

    pos [Ns, 3], mass [Ns] -> acc at target_pos [Nt, 3] (targets default to
    the sources). precision (errors measured vs f64 at N=4096 on v5e):
      'f32r' exact-f32 VPU row reduction — DEFAULT: most accurate (1.6e-7
             max component error vs f64) and fastest: 1.885e11 pairs/s at
             N=262k on v5e at the default (1024, 2048) tiles. Round 1
             shipped (512, 2048)/1.85e11 after two TPU-worker crashes
             implicated the larger tile; round 2's stability probe (3
             consecutive ~20 s dispatches + differential timing) cleared
             it — the crashes were dispatch-length (>~30 s), which is
             tile-independent (CLAUDE.md).
      'f32'  mass-folded MXU accumulation, 6-pass f32 matmul (1.6e-4 via
             cancellation amplification; 1.24e11 pairs/s)
      'fast' 3-pass bf16 matmul + tile centering (2.0e-3; 1.28e11 pairs/s)
      'bf16' bf16-pairwise study variant (4.7e-3; 1.16e11 — BASELINE cfg 4)
      'mxu'  MXU-r^2 prototype — measured NEGATIVE result (round 2):
             7.9e10 pairs/s (2.3x slower than f32r) at 1.8e-3 error; the
             centered-square cancellation and the [TI, TJ] operand splits
             cost more than the VPU dx chain they replace. Kept as the
             documented study; do not use in production.
      'hyb'  round-3 hybrid: r^2 cross term on the MXU (small [TI, 8]
             operands only), centered mass-folded f32 VPU accumulation —
             ~14 [TI, TJ] VPU ops/pair vs f32r's 19, no bf16 splits.
             MEASURED 1.32x slower than f32r (second MXU-r^2 negative;
             see _hyb_acc_kernel). Same accuracy class as 'mxu'.
    All rates measured with materialized-sync scan timing
    (nbx/bench/throughput.py); non-default variants quoted at (512, 2048).
    """
    if target_pos is None:
        target_pos = pos
    nt, ns = target_pos.shape[0], pos.shape[0]
    nt_p = _round_up(max(nt, 8), tile_i)
    ns_p = _round_up(max(ns, LANE), tile_j)

    pos32 = pos.astype(jnp.float32)
    tpos32 = target_pos.astype(jnp.float32)
    mass32 = mass.astype(jnp.float32)

    # Target matrix [Nt_p, 8]: x, y, z, 0...
    tgt = jnp.zeros((nt_p, 8), jnp.float32).at[:nt, 0:3].set(tpos32)
    # Source matrix [8, Ns_p]: rows x, y, z, mass (padding bodies at huge
    # distance would waste dynamic range; they carry zero mass so position 0
    # is fine). Row 3 (mass) is read by the bf16 kernel only.
    src = jnp.zeros((8, ns_p), jnp.float32).at[0:3, :ns].set(pos32.T)
    src = src.at[3, :ns].set(mass32)
    # Mass-folded source matrix [Ns_p, 8]: m x, m y, m z, m, 0... — read only
    # by the MXU kernels ('f32', 'fast'); 'mxu' instead wants RAW coords
    # (it folds mass into w and centers in-kernel); the VPU kernels get an
    # [8, 8] dummy so the hot path skips building and streaming it.
    needs_s = precision in ("f32", "fast", "mxu")
    if needs_s:
        s = jnp.zeros((ns_p, 8), jnp.float32)
        if precision == "mxu":
            s = s.at[:ns, 0:3].set(pos32)
        else:
            s = s.at[:ns, 0:3].set(pos32 * mass32[:, None])
            s = s.at[:ns, 3].set(mass32)
        s_spec = pl.BlockSpec((tile_j, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    else:
        s = jnp.zeros((8, 8), jnp.float32)
        s_spec = pl.BlockSpec((8, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    g_arr = jnp.asarray([[G]], jnp.float32)
    eps2 = jnp.asarray([[jnp.square(softening)]], jnp.float32)

    grid = (nt_p // tile_i, ns_p // tile_j)
    kernel = {
        "f32": _acc_kernel,
        "f32r": _f32r_acc_kernel,
        "fast": _fast_acc_kernel,
        "bf16": _bf16_acc_kernel,
        "mxu": _mxu_acc_kernel,
        "hyb": _hyb_acc_kernel,
    }[precision]
    flops_per_pair = 22
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # G
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # eps^2
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt_p, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * nt_p * ns_p,
            bytes_accessed=(nt_p * 8 + ns_p * 16 + nt_p * 8) * 4,
            transcendentals=nt_p * ns_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # An explicit VMEM budget is needed only to unlock tiles beyond
            # Mosaic's default acceptance (~(512, 2048) for f32r); at the
            # default tiling Mosaic's own budget pipelines best (measured:
            # capping it cost ~12%).
            **(
                {"vmem_limit_bytes": 100 * 1024 * 1024}
                if tile_i * tile_j > 512 * 2048
                else {}
            ),
        ),
        interpret=interpret,
    )(g_arr, eps2, tgt, src, s)
    return out[:nt, 0:3]


def _accjerk_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """acc AND jerk in one pass (the Hermite scheme's force evaluation,
    nbx.integrators.hermite_step; physics in nbx.forces.acc_and_jerk):

        acc  = sum_j w d,  jerk = sum_j w (dv - 3 (d.dv)/s^2 d),
        w = m_j / s^3

    f32r discipline: dx-first VPU chains, f32 row reductions, G folded at
    the end. ~40 VPU ops/pair. tgt [TI, 8] = x y z vx vy vz 0 0;
    src [8, TJ] = x y z m vx vy vz 0."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dx = src_ref[0:1, :] - tgt_ref[:, 0:1]
    dy = src_ref[1:2, :] - tgt_ref[:, 1:2]
    dz = src_ref[2:3, :] - tgt_ref[:, 2:3]
    dvx = src_ref[4:5, :] - tgt_ref[:, 3:4]
    dvy = src_ref[5:6, :] - tgt_ref[:, 4:5]
    dvz = src_ref[6:7, :] - tgt_ref[:, 5:6]
    r2 = dx * dx + dy * dy + dz * dz + eps2_ref[0, 0]
    inv = jax.lax.rsqrt(r2)
    inv2 = inv * inv
    w = inv * inv2 * src_ref[3:4, :]  # m_j / s^3
    c = 3.0 * (dx * dvx + dy * dvy + dz * dvz) * inv2  # 3 (d.dv) / s^2
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    jx = jnp.sum(w * (dvx - c * dx), axis=1, keepdims=True)
    jy = jnp.sum(w * (dvy - c * dy), axis=1, keepdims=True)
    jz = jnp.sum(w * (dvz - c * dz), axis=1, keepdims=True)
    zero = jnp.zeros_like(ax)
    out_ref[:] += jnp.concatenate([ax, ay, az, jx, jy, jz, zero, zero], 1)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = out_ref[:] * g_ref[0, 0]


def pairwise_acc_jerk(
    pos: jax.Array,
    mass: jax.Array,
    vel: jax.Array,
    G,
    softening,
    target_pos: jax.Array | None = None,
    target_vel: jax.Array | None = None,
    tile_i: int = 512,
    tile_j: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Softened acceleration + jerk via the Pallas kernel — the at-scale
    force evaluation for the 4th-order Hermite integrator. Requires
    softening > 0 (the self-pair is finite through eps^2, as pairwise_acc).
    Returns (acc [Nt, 3], jerk [Nt, 3]). Default tile_i is 512 (the kernel
    keeps ~2x the live [TI, TJ] temporaries of the 19-op acc kernel)."""
    if target_pos is None:
        target_pos = pos
        target_vel = vel
    nt, ns = target_pos.shape[0], pos.shape[0]
    nt_p = _round_up(max(nt, 8), tile_i)
    ns_p = _round_up(max(ns, LANE), tile_j)

    tgt = jnp.zeros((nt_p, 8), jnp.float32)
    tgt = tgt.at[:nt, 0:3].set(target_pos.astype(jnp.float32))
    tgt = tgt.at[:nt, 3:6].set(target_vel.astype(jnp.float32))
    src = jnp.zeros((8, ns_p), jnp.float32)
    src = src.at[0:3, :ns].set(pos.astype(jnp.float32).T)
    src = src.at[3, :ns].set(mass.astype(jnp.float32))
    src = src.at[4:7, :ns].set(vel.astype(jnp.float32).T)
    s = jnp.zeros((8, 8), jnp.float32)

    g_arr = jnp.asarray([[G]], jnp.float32)
    eps2 = jnp.asarray([[jnp.square(softening)]], jnp.float32)
    grid = (nt_p // tile_i, ns_p // tile_j)
    out = pl.pallas_call(
        _accjerk_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt_p, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=40 * nt_p * ns_p,
            bytes_accessed=(nt_p * 8 + ns_p * 8 + nt_p * 8) * 4,
            transcendentals=nt_p * ns_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(g_arr, eps2, tgt, src, s)
    return out[:nt, 0:3], out[:nt, 3:6]


def _potential_kernel(g_ref, eps2_ref, tgt_ref, src_ref, s_ref, out_ref):
    """Per-target softened potential: phi_i = -G sum_j m_j (d^2+eps^2)^(-1/2)
    (includes the i == j self term m_i / eps — subtracted by the wrapper)."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    dx = src_ref[0:1, :] - xi
    dy = src_ref[1:2, :] - yi
    dz = src_ref[2:3, :] - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2_ref[0, 0]
    inv = jax.lax.rsqrt(r2)
    out_ref[:] += jnp.dot(
        inv,
        s_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = out_ref[:] * (-g_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def potential_per_body(
    pos: jax.Array,
    mass: jax.Array,
    G,
    softening,
    target_pos: jax.Array | None = None,
    target_mass: jax.Array | None = None,
    tile_i: int = 256,
    tile_j: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """phi_i = -G sum_{j != i} m_j / sqrt(d^2 + eps^2) per target, [Nt] f32.

    Targets default to the sources. When targets are a subset of the sources
    (the sharded path), pass target_pos/target_mass: each target is assumed
    to appear exactly once among the sources, and its diagonal self term
    -G m_i / eps is subtracted. Total potential energy
    U = 0.5 * sum_i m_i phi_i (consistent with nbx.forces.potential_energy).
    Requires eps > 0.
    """
    if target_pos is None:
        target_pos = pos
    if target_mass is None:
        target_mass = mass
    nt, ns = target_pos.shape[0], pos.shape[0]
    nt_p = _round_up(max(nt, 8), tile_i)
    ns_p = _round_up(max(ns, LANE), tile_j)
    pos32 = pos.astype(jnp.float32)
    mass32 = mass.astype(jnp.float32)

    tgt = jnp.zeros((nt_p, 8), jnp.float32).at[:nt, 0:3].set(
        target_pos.astype(jnp.float32)
    )
    src = jnp.zeros((8, ns_p), jnp.float32).at[0:3, :ns].set(pos32.T)
    s = jnp.zeros((ns_p, 8), jnp.float32).at[:ns, 0].set(mass32)

    g_arr = jnp.asarray([[G]], jnp.float32)
    eps2 = jnp.asarray([[jnp.square(softening)]], jnp.float32)
    grid = (nt_p // tile_i, ns_p // tile_j)
    out = pl.pallas_call(
        _potential_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt_p, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(g_arr, eps2, tgt, src, s)
    phi = out[:nt, 0]
    # remove the self term: -G * m_i / eps
    return phi + G * target_mass.astype(jnp.float32) / softening


def potential_energy(pos, mass, G, softening, **kw) -> jax.Array:
    """Total softened potential energy via the Pallas kernel."""
    phi = potential_per_body(pos, mass, G, softening, **kw)
    return 0.5 * jnp.sum(mass * phi)
