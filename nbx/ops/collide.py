"""Pallas TPU kernel for cell-binned collision resolution — contacts at scale.

The dense masked resolver (nbx.collisions) carries [C, C] pair matrices
(interactive to capacity ~4k); the XLA binned resolver (nbx.collisions_binned)
is gather-bound (measured 2.9 s/step at 131k bodies). This kernel removes the
gathers: bodies are sorted by cell ONCE (nbx.ops.p3m.cell_bin), laid out
column-major — all cells sharing (i, j) form one contiguous block of
T = g * max_per_cell rows — and the kernel streams whole columns HBM -> VMEM.

Physics per pair (reference /root/reference/index.html:293-390):
  overlap        d^2 < (rA + rB)^2                      (L311-313)
  approaching    relVel . n < 0                         (L327)
  impulse        j = -(1+e)(v.n)/(1/mA+1/mB), e = 0.2   (L328-329)
  friction       jt = -(relVel . t) * 0.5 / (1/mA+1/mB) (L364-369)
  Baumgarte      push (minDist-d) * 0.8, mass-weighted  (L350-352)
  heating        dT = (E/m) * 0.2, E = mu/2 (v.n)^2     (L332-336)

TPU-first structure (NOT a translation of the scalar sweep):

  * grid (n_columns, 9): program (c, o) resolves target column c against its
    o-th neighbor column. The neighbor's column id arrives via SCALAR
    PREFETCH and drives the source BlockSpec index_map, so Mosaic's pipeline
    DMAs exactly the needed [16, T] column block — no XLA gather anywhere.
  * pair math is dense [T, T] VPU work (broadcast-subtract + row reductions,
    the same shape discipline as the gravity kernel nbx/ops/pairwise.py).
  * the o axis revisits the output block: bounce deltas accumulate with +=,
    and a per-target "deepest-overlap partner" record merges by max depth —
    this per-BODY partner is what replaces the reference's per-PAIR contact
    map at scale (see nbx.collisions_scaled for the timer semantics).
  * both ordered copies of each pair are processed (i as target of j and
    vice versa), each side accumulating its own half of the impulse — the
    Jacobi application, same divergence note as nbx.collisions.

Dead/padding bodies carry mass 0 and are masked by alive tests; clamped
duplicate neighbors at box faces point at an all-dead padding column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbx.ops.p3m import cell_bin

LANE = 128
CORRECTION = 0.8  # Baumgarte factor (index.html:350)
HEAT_FRACTION = 0.2  # impact heating fraction (index.html:335)
DEPTH_SENTINEL = -1e30
_BIG = 3e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _collide_kernel(neigh_ref, par_ref, tgt_ref, src_ref, delta_ref, evt_ref):
    """Grid (n_cols, 9), o minor (revisits the output blocks).

    tgt_ref   [T, 16]  target rows: x y z vx vy vz m r gidx 0...
    src_ref   [16, T]  source cols: same features transposed, lanes = bodies
    par_ref   [1, 2]   SMEM: restitution, friction
    delta_ref [T, 8]   += dvx dvy dvz dpx dpy dpz heat n_bounce
    evt_ref   [T, 8]   max-depth merge: depth j_gidx vn Q E m_j approaching 0
    """
    o = pl.program_id(1)

    t = tgt_ref[:]
    xi, yi, zi = t[:, 0:1], t[:, 1:2], t[:, 2:3]
    vxi, vyi, vzi = t[:, 3:4], t[:, 4:5], t[:, 5:6]
    mi, ri, gi = t[:, 6:7], t[:, 7:8], t[:, 8:9]

    s = src_ref[:]
    xj, yj, zj = s[0:1, :], s[1:2, :], s[2:3, :]
    vxj, vyj, vzj = s[3:4, :], s[4:5, :], s[5:6, :]
    mj, rj, gj = s[6:7, :], s[7:8, :], s[8:9, :]

    @pl.when(o == 0)
    def _():
        delta_ref[:] = jnp.zeros_like(delta_ref)
        no_depth = jnp.full_like(xi, DEPTH_SENTINEL)
        no_j = jnp.full_like(xi, -1.0)
        z = jnp.zeros_like(xi)
        evt_ref[:] = jnp.concatenate(
            [no_depth, no_j, z, z, z, z, z, z], axis=1
        )

    dx = xj - xi  # [T, T] i -> j
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    min_d = ri + rj
    alive2 = (mi > 0.0) & (mj > 0.0)
    distinct = jnp.abs(gi - gj) > 0.5
    overlap = alive2 & distinct & (r2 < min_d * min_d)

    inv_dist = jax.lax.rsqrt(jnp.where(r2 > 0.0, r2, 1.0))
    dist = r2 * inv_dist  # sqrt(r2), 0 at r2 == 0
    nx = dx * inv_dist
    ny = dy * inv_dist
    nz = dz * inv_dist
    rvx = vxj - vxi
    rvy = vyj - vyi
    rvz = vzj - vzi
    vn = rvx * nx + rvy * ny + rvz * nz
    appr = overlap & (vn < 0.0)

    inv_i = jnp.where(mi > 0.0, 1.0 / jnp.where(mi > 0.0, mi, 1.0), 0.0)
    inv_j = jnp.where(mj > 0.0, 1.0 / jnp.where(mj > 0.0, mj, 1.0), 0.0)
    inv_sum = inv_i + inv_j
    safe_is = jnp.where(inv_sum > 0.0, inv_sum, 1.0)

    e = par_ref[0, 0]
    fric = par_ref[0, 1]
    j_imp = jnp.where(appr, -(1.0 + e) * vn / safe_is, 0.0)
    tx = rvx - vn * nx
    ty = rvy - vn * ny
    tz = rvz - vn * nz
    t_len = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    t_inv = 1.0 / jnp.where(t_len > 0.0, t_len, 1.0)
    jt = jnp.where(appr, -t_len * fric / safe_is, 0.0)
    impx = j_imp * nx + jt * tx * t_inv
    impy = j_imp * ny + jt * ty * t_inv
    impz = j_imp * nz + jt * tz * t_inv

    # target side of the pair impulse: vel_i -= imp * inv_i
    dvx = -jnp.sum(impx, axis=1, keepdims=True) * inv_i[:, 0:1]
    dvy = -jnp.sum(impy, axis=1, keepdims=True) * inv_i[:, 0:1]
    dvz = -jnp.sum(impz, axis=1, keepdims=True) * inv_i[:, 0:1]

    corr = jnp.where(appr, (min_d - dist) / safe_is * CORRECTION, 0.0)
    dpx = -jnp.sum(corr * nx, axis=1, keepdims=True) * inv_i[:, 0:1]
    dpy = -jnp.sum(corr * ny, axis=1, keepdims=True) * inv_i[:, 0:1]
    dpz = -jnp.sum(corr * nz, axis=1, keepdims=True) * inv_i[:, 0:1]

    m_sum = mi + mj
    safe_ms = jnp.where(m_sum > 0.0, m_sum, 1.0)
    mu = mi * mj / safe_ms
    e_full = 0.5 * mu * vn * vn  # impact energy (unmasked, L333)
    heat = (
        jnp.sum(jnp.where(appr, e_full, 0.0), axis=1, keepdims=True)
        * inv_i[:, 0:1]
        * HEAT_FRACTION
    )
    n_b = jnp.sum(jnp.where(appr, 1.0, 0.0), axis=1, keepdims=True)

    delta_ref[:] += jnp.concatenate(
        [dvx, dvy, dvz, dpx, dpy, dpz, heat, n_b], axis=1
    )

    # ---- deepest-overlap partner (feeds the at-scale contact timers) ------
    depth = jnp.where(overlap, min_d - dist, DEPTH_SENTINEL)
    dmax = jnp.max(depth, axis=1, keepdims=True)  # [T, 1]
    has = dmax > 0.0
    cand = overlap & (depth >= dmax)
    # tie-break by smallest source gidx; each body appears at most once
    # across the 9 source columns, so `pick` has exactly one lane set
    gjb = gj + jnp.zeros_like(depth)
    jsel = jnp.min(jnp.where(cand, gjb, _BIG), axis=1, keepdims=True)
    pick = cand & (gjb <= jsel)
    sel = lambda m: jnp.sum(jnp.where(pick, m, 0.0), axis=1, keepdims=True)
    q_full = e_full / safe_ms  # specific energy (L338)
    new = jnp.concatenate(
        [
            jnp.where(has, dmax, DEPTH_SENTINEL),
            jnp.where(has, jsel, -1.0),
            sel(vn),
            sel(q_full),
            sel(e_full),
            sel(mj + jnp.zeros_like(depth)),
            sel(jnp.where(vn < 0.0, 1.0, 0.0)),
            jnp.zeros_like(dmax),
        ],
        axis=1,
    )
    old = evt_ref[:]
    evt_ref[:] = jnp.where(new[:, 0:1] > old[:, 0:1], new, old)


@functools.partial(
    jax.jit, static_argnames=("n_cells", "max_per_cell", "interpret")
)
def binned_collision_pass(
    pos,  # [N, 3] — binning domain [0, box)^3 (out-of-box clipped to faces)
    vel,  # [N, 3]
    mass,  # [N] (0 = dead/padding)
    radius,  # [N]
    box_size: float,
    n_cells: int,
    restitution=0.2,
    friction=0.5,
    max_per_cell: int = 16,
    interpret: bool = False,
):
    """One fused collision sweep over the 27-cell neighborhoods.

    Returns (dvel [N,3], dpos [N,3], dtemp [N], best, n_bounces, n_overflow,
    cell_too_small) where `best` is the per-body deepest-overlap partner
    record: dict(j [N] i32 (-1 = none), vn, q, energy, m_j [N] f32,
    approaching [N] bool). Deltas are Jacobi accumulations to ADD to the
    caller's state (same contract as nbx.collisions_binned).
    """
    n = pos.shape[0]
    g = n_cells
    n_cols = g * g
    t_rows = _round_up(max(g * max_per_cell, 8), LANE)

    table, _, n_overflow = cell_bin(pos, box_size, g, max_per_cell)
    cell_too_small = 2.0 * jnp.max(radius) > box_size / g

    # column-major body index table [n_cols, T], padded with n
    col_idx = table.reshape(n_cols, g * max_per_cell)
    col_idx = jnp.concatenate(
        [
            col_idx,
            jnp.full((n_cols, t_rows - g * max_per_cell), n, jnp.int32),
        ],
        axis=1,
    )

    # body feature matrix [N + 1, 16]; row n = dead padding parked far away
    f32 = jnp.float32
    feats = jnp.zeros((n + 1, 16), f32)
    feats = feats.at[:n, 0:3].set(pos.astype(f32))
    feats = feats.at[:n, 3:6].set(vel.astype(f32))
    feats = feats.at[:n, 6].set(mass.astype(f32))
    feats = feats.at[:n, 7].set(radius.astype(f32))
    feats = feats.at[:n, 8].set(jnp.arange(n, dtype=f32))
    feats = feats.at[n, 0:3].set(2.0 * box_size)
    feats = feats.at[n, 8].set(-2.0)  # never matches a real gidx

    tgt = feats[col_idx.reshape(-1)]  # [n_cols * T, 16] — the ONE gather
    src_cols = tgt.reshape(n_cols, t_rows, 16).transpose(0, 2, 1)
    # +1 padding column (all dead) for clamped-duplicate neighbors
    pad_col = jnp.broadcast_to(feats[n][:, None], (1, 16, t_rows))
    src = jnp.concatenate([src_cols, pad_col], axis=0).reshape(-1, t_rows)

    # 9-neighborhood column ids (di, dj); invalid offsets -> padding column
    cc = jnp.arange(n_cols, dtype=jnp.int32)
    ci, cj = cc // g, cc % g
    neigh = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ni, nj = ci + di, cj + dj
            ok = (ni >= 0) & (ni < g) & (nj >= 0) & (nj < g)
            neigh.append(jnp.where(ok, ni * g + nj, n_cols))
    neigh = jnp.stack(neigh, axis=1)  # [n_cols, 9]

    par = jnp.asarray([[restitution, friction]], f32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_cols, 9),
        in_specs=[
            pl.BlockSpec((1, 2), lambda c, o, nr: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t_rows, 16), lambda c, o, nr: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, t_rows), lambda c, o, nr: (nr[c, o], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_rows, 8), lambda c, o, nr: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_rows, 8), lambda c, o, nr: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    pair_ops = 60  # ~VPU ops per pair evaluation
    delta, evt = pl.pallas_call(
        _collide_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_cols * t_rows, 8), f32),
            jax.ShapeDtypeStruct((n_cols * t_rows, 8), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=pair_ops * n_cols * 9 * t_rows * t_rows,
            bytes_accessed=(n_cols * t_rows * (16 + 16 * 9 + 16)) * 4,
            transcendentals=n_cols * 9 * t_rows * t_rows,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The pair math keeps ~16 [T, T] f32 temporaries live (impulse,
            # friction, heating, partner-selection chains): at T = 512 that
            # is ~16.4 MB, just past Mosaic's default 16 MB scoped budget.
            # An explicit budget unlocks it (same lever as the gravity
            # kernel's beyond-default tiles, nbx/ops/pairwise.py).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(neigh, par, tgt, src)

    # scatter back to body order (each live body appears exactly once)
    flat_idx = col_idx.reshape(-1)
    out_d = jnp.zeros((n + 1, 8), f32).at[flat_idx].add(delta, mode="drop")
    out_e = (
        jnp.full((n + 1, 8), DEPTH_SENTINEL, f32)
        .at[flat_idx]
        .set(evt, mode="drop")
    )
    dvel = out_d[:n, 0:3]
    dpos = out_d[:n, 3:6]
    dtemp = out_d[:n, 6]
    n_bounces = (jnp.sum(out_d[:n, 7]) / 2.0).astype(jnp.int32)

    has = out_e[:n, 0] > 0.0
    best = dict(
        j=jnp.where(has, out_e[:n, 1].astype(jnp.int32), -1),
        vn=jnp.where(has, out_e[:n, 2], 0.0),
        q=jnp.where(has, out_e[:n, 3], 0.0),
        energy=jnp.where(has, out_e[:n, 4], 0.0),
        m_j=jnp.where(has, out_e[:n, 5], 0.0),
        approaching=has & (out_e[:n, 6] > 0.5),
    )
    return dvel, dpos, dtemp, best, n_bounces, n_overflow, cell_too_small
