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
  * k-banding (band_cells=B): a cell at depth k only overlaps neighbors at
    k-1..k+1, so pairing full g-cell columns wastes ~g/3 of the pair work.
    With banding, each target strip of B cells meets a GUARD-PADDED source
    strip of B+2 cells. Pair work drops from 9 g^4 K^2 to
    ~9 g^3 K^2 (B+2)/B. The banded path additionally FUSES the 9-neighbor
    axis: the source block of a (column, band) program is the whole 3x3
    column neighborhood's guarded strips materialized contiguously by ONE
    XLA gather ([16, 9 (B+2) K] lanes), so the grid is 1D with ~9x fewer
    programs, outputs are written once (no revisit accumulation), and no
    scalar prefetch is needed. Measured motivation: at (32, 16) the
    prefetch-driven 9-revisit banded grid ran 55k programs and grid
    overhead ate most of the 3.5x pair-work cut.
  * band-PACKED layout (packed_caps=(Tc, Sc)): the banded layouts above
    reserve K slots per CELL, but cells average ~4-8 bodies at production
    grids while K must cover the per-cell occupancy TAIL (K=16) — most of
    every block is dead lanes. The packed layout drops per-cell slots
    entirely: Tc caps each b-cell target window, and ONE shared cap Sc
    covers a program's whole fused source neighborhood (9 columns x
    guarded (b+2)-cell strips). Occupancy fluctuations average over the
    window's cells — and over the neighborhood's 27-54 cells for Sc — so
    caps sit near the window MEAN instead of ~4x the per-cell tail: a
    measured ~2.3x pair-work cut over the banded layout at equal coverage.
    CONSTRUCTION IS BY CHUNK GATHER: cell_sort keeps k minor within a
    column, so every guarded window is a contiguous run of the sorted
    order. The strips are materialized ONCE per (column, band) by a
    consecutive-index row gather (~1.25 N rows), transposed to [16, Sc],
    and the fused source blocks then gather whole multi-KB strip CHUNKS
    via stripsT[neigh] — large contiguous copies that stream at HBM
    bandwidth, instead of 64-byte body rows. Measured alternatives, both
    worse at 131k: per-row window gathers of the fused [blocks, 16, S]
    blocks cost 39 ms (more than the kernel they feed); per-body
    destination-slot SCATTERS (<= 27 row scatters) cost ~360 ms — XLA TPU
    scatter serializes (the same lesson as the rank-scatter rule in
    CLAUDE.md). Windows exceeding a cap drop bodies (targets) or miss
    partners (sources); both are counted into n_overflow (no-silent-caps),
    zero on sane caps. OVERFLOW SYMMETRY: target-cap drops (and the
    compacted layout's window-budget drops) degrade symmetrically — the
    dropped body is masked out of the source strips too, so surviving
    impulses stay pairwise equal-and-opposite and momentum is conserved
    under that overflow class. SOURCE-cap drops are one-sided by
    construction (a body's rank differs between the up-to-3 band strips
    that contain it, so per-body masking cannot express per-strip
    presence): a strip-tail body still receives impulses as a target that
    its partners never get back — measured momentum residual on a forced
    source-overflow scene. Treat nonzero n_overflow from source caps as a
    re-tune signal (packed_caps_for covers the tail with slack), not a
    running mode.
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

from nbx.ops.p3m import cell_bin, cell_sort

LANE = 128
CORRECTION = 0.8  # Baumgarte factor (index.html:350)
HEAT_FRACTION = 0.2  # impact heating fraction (index.html:335)
DEPTH_SENTINEL = -1e30
_BIG = 3e38
# Abramowitz & Stegun 7.1.26 erfc coefficients (keep in sync with
# nbx.ops.ppkernel — the fused short-range gravity must match the PP
# kernel's erfc bit-for-bit so both P3M paths share one error budget)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _collide_kernel(neigh_ref, par_ref, tgt_ref, src_ref, delta_ref, evt_ref):
    """Grid (n_cols, 9), o minor (revisits the output blocks).

    tgt_ref   [T, 16]  target rows: x y z vx vy vz m r gidx 0...
    src_ref   [16, T]  source cols: same features transposed, lanes = bodies
    par_ref   [1, 2]   SMEM: restitution, friction
    delta_ref [T, 8]   += dvx dvy dvz dpx dpy dpz heat n_bounce
    evt_ref   [T, 8]   max-depth merge: depth j_gidx 0... — the partner's
                       pair quantities (vn, Q, E, m_j, approaching) are
                       recomputed O(N) in the XLA epilogue from (i, j),
                       keeping the O(N S) kernel lean
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
    # across the 9 source columns, so the pick is unique
    gjb = gj + jnp.zeros_like(depth)
    jsel = jnp.min(jnp.where(cand, gjb, _BIG), axis=1, keepdims=True)
    z8 = jnp.zeros_like(dmax)
    new = jnp.concatenate(
        [
            jnp.where(has, dmax, DEPTH_SENTINEL),
            jnp.where(has, jsel, -1.0),
            z8, z8, z8, z8, z8, z8,
        ],
        axis=1,
    )
    old = evt_ref[:]
    # cross-visit merge: max depth, ties broken by smallest source gidx —
    # matching the fused kernel's cross-chunk rule so every layout picks
    # the same partner on bitwise-equal depths (symmetric/lattice scenes)
    better = new[:, 0:1] > old[:, 0:1]
    tie = (new[:, 0:1] == old[:, 0:1]) & (new[:, 1:2] < old[:, 1:2])
    evt_ref[:] = jnp.where(better | tie, new, old)


def _collide_kernel_fused(par_ref, tgt_ref, src_ref, delta_ref, evt_ref):
    """1D grid, single visit: target strip vs its FULL fused 3x3xk-guard
    source neighborhood (see _collide_fused_body)."""
    _collide_fused_body(par_ref, tgt_ref, src_ref, delta_ref, evt_ref, None)


def _collide_kernel_fused_multi(
    par_ref, tgt_ref, src_ref, delta_ref, evt_ref, *, n_w
):
    """_collide_kernel_fused over n_w INDEPENDENT windows per grid program
    (blocks stacked along the row axis: window w owns tgt rows
    [w t_rows, (w+1) t_rows) and src rows [16 w, 16 (w+1))). Fewer,
    fatter programs amortize Mosaic's per-program cost. Built to test
    round 4's program-count hypothesis for the fine-grid tax — and it
    REFUTED it: W=8 cuts programs 8x and moves nothing at 131k-262k
    (docs/RESULTS.md round 5), so windows_per_block defaults to 1; the
    kernel is kept for reproducibility and for shapes where per-program
    cost may yet dominate (very small t_rows x s_rows blocks)."""
    for w in range(n_w):
        _collide_fused_body(
            par_ref, tgt_ref, src_ref, delta_ref, evt_ref, None,
            w=w, n_w=n_w,
        )


def _collide_kernel_fused_grav(
    par_ref, tgt_ref, src_ref, delta_ref, evt_ref, grav_ref
):
    """_collide_kernel_fused PLUS the P3M short-range (erfc) gravity sum
    over the SAME pair blocks — the pairs the collision sweep already
    visits are exactly the +-1-cell neighborhood the PP pass needs when
    the P3M split scale is tied to the collision grid (a = cell / 3), so
    fusing the erfc accumulation into this kernel gives the short-range
    gravity for free in memory traffic (~15 extra VPU ops + 1 exp per
    pair lane). par_ref widens to [1, 6] (+ G, 1/a, 2/(a sqrt(pi)),
    eps^2); grav_ref [T, 8] = G ax, G ay, G az, 0... The erfc uses the
    A&S 7.1.26 polynomial exactly like nbx.ops.ppkernel (abs err
    <= 1.5e-7). Force law per /root/reference/index.html:264-291 with
    the Ewald-style erfc split (nbx.ops.p3m module docstring)."""
    _collide_fused_body(
        par_ref, tgt_ref, src_ref, delta_ref, evt_ref, grav_ref
    )


def _collide_fused_body(par_ref, tgt_ref, src_ref, delta_ref, evt_ref,
                        grav_ref, w=0, n_w=1):
    """1D grid, single visit: target strip vs its FULL fused 3x3xk-guard
    source neighborhood. With n_w > 1 the refs hold n_w stacked windows
    and this body processes window w's row slices only (static offsets —
    see _collide_kernel_fused_multi).

    tgt_ref   [T, 16]  target rows: x y z vx vy vz m r gidx 0...
    src_ref   [16, S]  fused neighborhood, lanes = bodies (dead-padded)
    par_ref   [1, 2]   SMEM: restitution, friction ([1, 6] with grav_ref)
    delta_ref [T, 8]   = dvx dvy dvz dpx dpy dpz heat n_bounce
    evt_ref   [T, 8]   = depth j_gidx vn Q E m_j approaching 0 (deepest)
    grav_ref  [T, 8]   optional short-range gravity (see
                       _collide_kernel_fused_grav)

    Same physics as _collide_kernel with exact algebraic cuts (measured:
    the kernel is VPU-rate-bound, so ops/pair is the lever):

      * ONE reciprocal per pair instead of two: the impulse denominator
        1/(1/mA + 1/mB) IS the reduced mass mu = mA mB/(mA + mB), so the
        masked mu carries impulse scale, friction scale, Baumgarte scale
        AND the impact energy E = mu/2 (v.n)^2 (L329, L333, L352, L369).
      * normals are never materialized: impulse = a2 * d - ft * rv with
        a2 = (j + ft vn) / dist folding the friction tangent
        (t_vec = rv - vn n, its normalization cancels, L364-369) and the
        1/dist of n = d/dist into one coefficient — every per-component
        term is a 2-op FMA chain.
      * the S axis is processed in 128-lane CHUNKS with running [T, 1]
        accumulators: the live [T, chunk] working set is ~8x smaller than
        whole-row temporaries, which measured 1.23x on the kernel alone
        (docs/RESULTS.md — the [T, S] temporaries otherwise stream
        through VMEM).
    """
    t_rows_w = tgt_ref.shape[0] // n_w
    t = tgt_ref[w * t_rows_w:(w + 1) * t_rows_w, :]
    xi, yi, zi = t[:, 0:1], t[:, 1:2], t[:, 2:3]
    vxi, vyi, vzi = t[:, 3:4], t[:, 4:5], t[:, 5:6]
    mi, ri, gi = t[:, 6:7], t[:, 7:8], t[:, 8:9]
    inv_i = jnp.where(mi > 0.0, 1.0 / jnp.where(mi > 0.0, mi, 1.0), 0.0)
    sc_i = inv_i[:, 0:1]
    e = par_ref[0, 0]
    fric = par_ref[0, 1]
    if grav_ref is not None:
        g_sc = par_ref[0, 2]
        inv_a = par_ref[0, 3]
        c_a = par_ref[0, 4]
        eps2 = par_ref[0, 5]

    s_rows = src_ref.shape[1]
    chunk = LANE if s_rows % LANE == 0 else s_rows
    acc = None
    dmax = None
    jsel = None
    for c in range(s_rows // chunk):
        s = src_ref[16 * w:16 * (w + 1), c * chunk:(c + 1) * chunk]
        xj, yj, zj = s[0:1, :], s[1:2, :], s[2:3, :]
        vxj, vyj, vzj = s[3:4, :], s[4:5, :], s[5:6, :]
        mj, rj, gj = s[6:7, :], s[7:8, :], s[8:9, :]

        dx = xj - xi  # [T, chunk] i -> j
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz
        min_d = ri + rj
        alive2 = (mi > 0.0) & (mj > 0.0)
        distinct = jnp.abs(gi - gj) > 0.5
        overlap = alive2 & distinct & (r2 < min_d * min_d)

        inv_dist = jax.lax.rsqrt(jnp.where(r2 > 0.0, r2, 1.0))
        dist = r2 * inv_dist  # sqrt(r2), 0 at r2 == 0
        rvx = vxj - vxi
        rvy = vyj - vyi
        rvz = vzj - vzi
        vn = (rvx * dx + rvy * dy + rvz * dz) * inv_dist
        appr = overlap & (vn < 0.0)

        m_sum = mi + mj
        r_ms = 1.0 / jnp.where(m_sum > 0.0, m_sum, 1.0)
        mu_g = jnp.where(appr, mi * mj * r_ms, 0.0)  # masked reduced mass

        tvn = vn * mu_g  # masked mu * vn, shared by impulse and heating
        j_imp = -(1.0 + e) * tvn  # L328-329
        ft = fric * mu_g  # friction impulse = -ft * t_vec (L364-369)
        a2 = (j_imp + ft * vn) * inv_dist
        # Baumgarte push (minDist - d) mu 0.8 along n (L350-352)
        c2 = (min_d - dist) * inv_dist * (CORRECTION * mu_g)
        sums = [
            jnp.sum(a2 * dx - ft * rvx, axis=1, keepdims=True),
            jnp.sum(a2 * dy - ft * rvy, axis=1, keepdims=True),
            jnp.sum(a2 * dz - ft * rvz, axis=1, keepdims=True),
            jnp.sum(c2 * dx, axis=1, keepdims=True),
            jnp.sum(c2 * dy, axis=1, keepdims=True),
            jnp.sum(c2 * dz, axis=1, keepdims=True),
            # impact heating: E = mu/2 (v.n)^2 masked (L333-336)
            jnp.sum(0.5 * vn * tvn, axis=1, keepdims=True),
            jnp.sum(jnp.where(appr, 1.0, 0.0), axis=1, keepdims=True),
        ]
        if grav_ref is not None:
            # erfc short-range gravity over the same pair lanes (see
            # _collide_kernel_fused_grav): w = m_j (erfc(x)/s + c_a
            # e^-x^2) / s^2, x = s/a, s = sqrt(r^2 + eps^2)
            s2 = r2 + eps2
            inv_s = jax.lax.rsqrt(jnp.where(s2 > 0.0, s2, 1.0))
            x = (s2 * inv_s) * inv_a
            ex2 = jnp.exp(-x * x)
            tt = 1.0 / (1.0 + _AS_P * x)
            poly = _AS_A[4]
            for a_k in (_AS_A[3], _AS_A[2], _AS_A[1], _AS_A[0]):
                poly = poly * tt + a_k
            erfc_x = poly * tt * ex2
            wg = jnp.where(
                alive2 & distinct & (r2 > 0.0),
                mj * (erfc_x * inv_s + c_a * ex2) * (inv_s * inv_s),
                0.0,
            )
            sums += [
                jnp.sum(wg * dx, axis=1, keepdims=True),
                jnp.sum(wg * dy, axis=1, keepdims=True),
                jnp.sum(wg * dz, axis=1, keepdims=True),
            ]
        # deepest-overlap partner, tie-break by smallest source gidx —
        # including ACROSS chunks: equal depths merge by min gidx, so the
        # pick is independent of chunk/lane position (layout-invariant)
        depth = jnp.where(overlap, min_d - dist, DEPTH_SENTINEL)
        dm = jnp.max(depth, axis=1, keepdims=True)  # [T, 1]
        cand = depth >= dm
        gjb = gj + jnp.zeros_like(depth)
        js = jnp.min(jnp.where(cand, gjb, _BIG), axis=1, keepdims=True)
        if acc is None:
            acc, dmax, jsel = sums, dm, js
        else:
            acc = [a + x for a, x in zip(acc, sums)]
            better = dm > dmax
            tie = dm == dmax
            jsel = jnp.where(
                better, js,
                jnp.where(tie, jnp.minimum(js, jsel), jsel),
            )
            dmax = jnp.where(better, dm, dmax)

    # target side of the pair impulse: vel_i -= (a2 d - ft rv) / m_i
    rows_w = slice(w * t_rows_w, (w + 1) * t_rows_w)
    delta_ref[rows_w, :] = jnp.concatenate(
        [
            -acc[0] * sc_i, -acc[1] * sc_i, -acc[2] * sc_i,
            -acc[3] * sc_i, -acc[4] * sc_i, -acc[5] * sc_i,
            acc[6] * sc_i * HEAT_FRACTION, acc[7],
        ],
        axis=1,
    )

    has = dmax > 0.0
    z8 = jnp.zeros_like(dmax)
    evt_ref[rows_w, :] = jnp.concatenate(
        [
            jnp.where(has, dmax, DEPTH_SENTINEL),
            jnp.where(has, jsel, -1.0),
            z8, z8, z8, z8, z8, z8,
        ],
        axis=1,
    )
    if grav_ref is not None:
        grav_ref[rows_w, :] = jnp.concatenate(
            [
                g_sc * acc[8], g_sc * acc[9], g_sc * acc[10],
                z8, z8, z8, z8, z8,
            ],
            axis=1,
        )


def _collide_par(restitution, friction, short_gravity=None):
    """SMEM parameter row: [1, 2] plain, [1, 6] with fused short-range
    gravity (G, 1/a, 2/(a sqrt(pi)), eps^2 appended — all dynamic, so
    retuning G/a/eps never recompiles)."""
    f32 = jnp.float32
    if short_gravity is None:
        return jnp.asarray([[restitution, friction]], f32)
    G, a, eps = short_gravity
    a32 = jnp.asarray(a, f32)
    return jnp.stack([
        jnp.asarray(restitution, f32), jnp.asarray(friction, f32),
        jnp.asarray(G, f32), 1.0 / a32,
        2.0 / (a32 * jnp.sqrt(jnp.pi).astype(f32)),
        jnp.asarray(eps, f32) ** 2,
    ])[None, :]


def _grav_pallas_extras(short_gravity, t_rows, s_rows, n_blocks):
    """(kernel fn, extra out_specs, extra out_shapes, par width) for an
    optionally gravity-fused collision pallas_call."""
    if short_gravity is None:
        return _collide_kernel_fused, [], [], 2
    return (
        _collide_kernel_fused_grav,
        [pl.BlockSpec((t_rows, 8), lambda c: (c, 0),
                      memory_space=pltpu.VMEM)],
        [jax.ShapeDtypeStruct((n_blocks * t_rows, 8), jnp.float32)],
        6,
    )


def _body_feats(pos, vel, mass, radius, box_size):
    """[N + 1, 16] feature matrix; row n = dead padding parked far away."""
    n = pos.shape[0]
    f32 = jnp.float32
    feats = jnp.zeros((n + 1, 16), f32)
    feats = feats.at[:n, 0:3].set(pos.astype(f32))
    feats = feats.at[:n, 3:6].set(vel.astype(f32))
    feats = feats.at[:n, 6].set(mass.astype(f32))
    feats = feats.at[:n, 7].set(radius.astype(f32))
    feats = feats.at[:n, 8].set(jnp.arange(n, dtype=f32))
    feats = feats.at[n, 0:3].set(2.0 * box_size)
    feats = feats.at[n, 8].set(-2.0)  # never matches a real gidx
    return feats


def _column_neighbors(g: int):
    """9-neighborhood column ids [g*g, 9]; invalid offsets -> g*g."""
    n_cols = g * g
    cc = jnp.arange(n_cols, dtype=jnp.int32)
    ci, cj = cc // g, cc % g
    neigh = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ni, nj = ci + di, cj + dj
            ok = (ni >= 0) & (ni < g) & (nj >= 0) & (nj < g)
            neigh.append(jnp.where(ok, ni * g + nj, n_cols))
    return jnp.stack(neigh, axis=1)


def _window_counts(pos, box_size: float, n_cells: int, band_cells: int):
    """Per-(column, band) occupancies of target windows and guarded source
    strips, as numpy arrays [n_cols, n_bands] (host-side measurement)."""
    import numpy as np

    g = n_cells
    b = band_cells
    n_bands = -(-g // b)
    _, starts, _ = cell_sort(jnp.asarray(pos), box_size, g)
    st = np.asarray(starts)
    cols = np.arange(g * g, dtype=np.int64)
    w = np.arange(n_bands, dtype=np.int64)
    cnt_t = (
        st[cols[:, None] * g + np.minimum(w[None, :] * b + b, g)]
        - st[cols[:, None] * g + w[None, :] * b]
    )
    cnt_s = (
        st[cols[:, None] * g + np.minimum(w[None, :] * b + b + 1, g)]
        - st[cols[:, None] * g + np.maximum(w[None, :] * b - 1, 0)]
    )
    return cnt_t, cnt_s


def packed_layout_for(
    pos,
    box_size: float,
    n_cells: int,
    band_cells: int,
    slack: float = 1.25,
    quantile: float = 1.0,
    block_slack: float = 1.3,
    max_source_lanes: int = 8192,
    max_block_pair_lanes: int = 2 * 1024 * 1024,
) -> dict:
    """Measure THIS frame's window occupancy and suggest an occupancy-
    COMPACTED packed configuration for binned_collision_pass:
    dict(packed_caps=(t_cap, s_cap), max_blocks, occupied, occupied_frac).

    HOST-side (returns python ints — static jit args; call once per scene
    or when n_overflow goes nonzero). Unlike packed_caps_for, tail-sized
    caps are acceptable here: only OCCUPIED windows pay them, so the lane
    bound is much looser — it guards the VMEM block size, not the total
    pair work. block_slack leaves headroom for occupancy drift (bodies
    migrating into previously-empty windows) before a re-tune."""
    import numpy as np

    cnt_t, cnt_s = _window_counts(pos, box_size, n_cells, band_cells)

    def pick(cnt):
        o = cnt[cnt > 0]
        if o.size == 0:
            return 8
        v = o.max() if quantile >= 1.0 else np.quantile(o, quantile)
        return max(8, int(np.ceil(v * slack)))

    t_cap, s_cap = pick(cnt_t), pick(cnt_s)
    if 9 * s_cap > max_source_lanes:
        raise ValueError(
            f"compacted packed caps ({t_cap}, {s_cap}) need {9 * s_cap}"
            f" fused source lanes (> {max_source_lanes}): the source block"
            " would not fit VMEM. Use a finer n_cells or a lower quantile."
        )
    t_rows = _round_up(max(t_cap, 8), 8)
    s_rows = _round_up(max(9 * s_cap, 9 * 8), LANE)
    if t_rows * s_rows > max_block_pair_lanes:
        # Per-PROGRAM size bound, separate from the lane/VMEM bound: the
        # fused kernel unrolls the source axis in 128-lane chunks, so a
        # tail-cap block like (1200, 11136) becomes an ~87-chunk Mosaic
        # program whose remote compile never returns (measured; the shipped
        # 131k config is 96 x 1024 = 98k pair lanes and compiles in
        # seconds). Total pair WORK being affordable does not make one
        # PROGRAM of it compilable.
        raise ValueError(
            f"compacted packed block ({t_rows} x {s_rows}) ="
            f" {t_rows * s_rows} pair lanes per program"
            f" (> {max_block_pair_lanes}): the kernel's chunk unroll would"
            " not compile in reasonable time. Use a finer n_cells (smaller"
            " windows) or a lower quantile."
        )
    occupied = int((cnt_t > 0).sum())
    total = int(cnt_t.size)
    max_blocks = max(8, -(-int(np.ceil(occupied * block_slack)) // 8) * 8)
    return dict(
        packed_caps=(t_cap, s_cap),
        max_blocks=max_blocks,
        occupied=occupied,
        occupied_frac=occupied / total,
    )


def _window_max_strip_runs(pos, box_size: float, n_cells: int,
                           band_cells: int, cnt_s=None):
    """Per-window (column x band) MAX guarded-strip run over the 9 neighbor
    columns, numpy [n_cols, n_bands] (host-side). This — not the own-column
    run — is what the per-strip source cap of the compacted/bucketed
    layouts must cover. Pass cnt_s (from _window_counts) to avoid a second
    device-side census."""
    import numpy as np

    g = n_cells
    if cnt_s is None:
        _, cnt_s = _window_counts(pos, box_size, n_cells, band_cells)
    n_bands = cnt_s.shape[1]
    # pad with a zero-run virtual column for out-of-range neighbors
    cs = np.concatenate([cnt_s, np.zeros((1, n_bands), cnt_s.dtype)], axis=0)
    cc = np.arange(g * g)
    ci, cj = cc // g, cc % g
    m = np.zeros_like(cnt_s)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ni, nj = ci + di, cj + dj
            ok = (ni >= 0) & (ni < g) & (nj >= 0) & (nj < g)
            idx = np.where(ok, ni * g + nj, g * g)
            m = np.maximum(m, cs[idx])
    return m


def bucket_flags_host(cnt_t, maxrun, caps):
    """First-covering-bucket window assignment, numpy bool arrays per
    bucket (host-side) — THE assignment rule; the traced builders
    (_packed_bucketed_blocks / bucketed_collision_blocks_local) implement
    the same rule on device, and every host-side budget sizing must go
    through here so budgets stay in sync with the caps."""
    import numpy as np

    occ = cnt_t > 0
    remaining = occ
    out = []
    for bi, (t, sc, _) in enumerate(caps):
        if bi == len(caps) - 1:
            fl = remaining
        else:
            fl = remaining & (cnt_t <= t) & (maxrun <= sc)
        remaining = remaining & ~fl
        out.append(fl)
    return out


def bucketed_layout_for(
    pos,
    box_size: float,
    n_cells: int,
    band_cells: int,
    split_quantile: float = 0.8,
    slack: float = 1.25,
    block_slack: float = 1.3,
    max_source_lanes: int = 8192,
    max_block_pair_lanes: int = 2 * 1024 * 1024,
    _stats=None,  # precomputed (cnt_t, maxrun) — skips the device census
) -> tuple[tuple[int, int, int], ...]:
    """Measure THIS frame's window occupancy and size a two-bucket
    occupancy-compacted configuration for binned_collision_pass(buckets=...):
    ((t_cap1, s_cap1, max_blocks1), (t_cap2, s_cap2, max_blocks2)).

    Bucket 1 takes every occupied window whose target count and max
    neighbor-strip run fit caps sized at `split_quantile` of the occupied
    distribution; bucket 2 takes the tail at max-sized caps. Single-tier
    caps must track the densest window (an extreme-value tail that grows
    with the window count — docs/RESULTS.md "N-scaling"), so the bulk of
    windows pays ~cap_tail/cap_median more pair lanes than their occupancy
    needs; two buckets bound that tax at the cost of one extra (small)
    kernel launch. HOST-side: returns python ints (static jit args — call
    per scene or when n_overflow goes nonzero)."""
    import numpy as np

    if _stats is None:
        cnt_t, cnt_s = _window_counts(pos, box_size, n_cells, band_cells)
        maxrun = _window_max_strip_runs(pos, box_size, n_cells,
                                        band_cells, cnt_s=cnt_s)
    else:
        cnt_t, maxrun = _stats
    occ = cnt_t > 0
    if not occ.any():
        return ((8, 8, 8), (8, 8, 8))
    oc, orun = cnt_t[occ], maxrun[occ]

    def cap(v):
        return max(8, int(np.ceil(v * slack)))

    t1 = cap(np.quantile(oc, split_quantile))
    s1 = cap(np.quantile(orun, split_quantile))
    t2 = cap(oc.max())
    s2 = cap(orun.max())
    in1, in2 = bucket_flags_host(
        cnt_t, maxrun, ((t1, s1, 0), (t2, s2, 0))
    )
    if 9 * s2 > max_source_lanes:
        raise ValueError(
            f"bucketed tail caps ({t2}, {s2}) need {9 * s2} fused source"
            f" lanes (> {max_source_lanes}). Use a finer n_cells or the"
            " compacted layout with a quantile cap."
        )
    t2r = _round_up(max(t2, 8), 8)
    s2r = _round_up(9 * max(s2, 8), LANE)
    if t2r * s2r > max_block_pair_lanes:
        raise ValueError(
            f"bucketed tail block ({t2r} x {s2r}) exceeds"
            f" {max_block_pair_lanes} pair lanes per program (compile-time"
            " bound, see packed_layout_for). Use a finer n_cells."
        )

    def budget(k):
        return max(8, -(-int(np.ceil(k * block_slack)) // 8) * 8)

    return (
        (t1, s1, budget(int(in1.sum()))),
        (t2, s2, budget(int(in2.sum()))),
    )


def packed_caps_for(
    pos,
    box_size: float,
    n_cells: int,
    band_cells: int,
    slack: float = 1.25,
    quantile: float = 1.0,
    max_source_lanes: int = 4096,
) -> tuple[int, int]:
    """Measure THIS frame's actual window occupancies and suggest
    packed_caps = (t_cap, s_cap) covering them with `slack` headroom for
    drift until the caller re-tunes. HOST-side (returns python ints —
    packed_caps is a static jit argument; calling this per-frame would
    recompile on every occupancy change, so call it once per scene or
    when n_overflow goes nonzero).

    quantile < 1.0 caps at that occupancy quantile of the OCCUPIED
    windows instead of the max — bounded work at the price of counted
    overflow, the same trade max_per_cell makes in the banded layout.

    LAYOUT CHOICE BY SCENE SHAPE: uniform caps only pay when occupancy is
    near-uniform. On a peaked scene (e.g. a thin debris annulus where ~2%
    of windows hold every body at ~900/window) covering the dense windows
    multiplies the pair work ~25x and the in-kernel chunk unroll with it
    — use the banded per-cell-cap layout there instead. This function
    raises when the suggestion exceeds max_source_lanes fused source
    lanes rather than hand back a pathological compile.
    """
    import numpy as np

    cnt_t, cnt_s = _window_counts(pos, box_size, n_cells, band_cells)

    def pick(cnt):
        occ = cnt[cnt > 0]
        if occ.size == 0:
            return 8
        v = occ.max() if quantile >= 1.0 else np.quantile(occ, quantile)
        return max(8, int(np.ceil(v * slack)))

    t_cap, s_cap = pick(cnt_t), pick(cnt_s)
    if 9 * s_cap > max_source_lanes:
        occ_frac = float((cnt_t > 0).mean())
        raise ValueError(
            f"packed caps ({t_cap}, {s_cap}) need {9 * s_cap} fused source"
            f" lanes (> {max_source_lanes}): occupancy is too peaked for"
            f" uniform window caps ({occ_frac:.1%} of windows occupied)."
            " Use the banded per-cell-cap layout (band_cells without"
            " packed_caps), a lower quantile=, or a finer n_cells."
        )
    return t_cap, s_cap


@functools.partial(
    jax.jit,
    static_argnames=("n_cells", "max_per_cell", "band_cells", "packed_caps",
                     "max_blocks", "buckets", "interpret",
                     "windows_per_block", "construction"),
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
    band_cells: int | None = None,
    packed_caps: tuple[int, int] | None = None,
    max_blocks: int | None = None,
    buckets: tuple[tuple[int, int, int], ...] | None = None,
    interpret: bool = False,
    windows_per_block: int = 1,
    construction: str = "auto",
):
    """One fused collision sweep over the 27-cell neighborhoods.

    Returns (dvel [N,3], dpos [N,3], dtemp [N], best, n_bounces, n_overflow,
    cell_too_small) where `best` is the per-body deepest-overlap partner
    record: dict(j [N] i32 (-1 = none), vn, q, energy, m_j [N] f32,
    approaching [N] bool). Deltas are Jacobi accumulations to ADD to the
    caller's state (same contract as nbx.collisions_binned).

    band_cells=B switches to the k-banded layout (module docstring): same
    interacting pair set whenever cell_too_small is False (bodies that
    overlap from >1 cell apart in k are missed — exactly the regime the
    flag already marks as unreliable), floating-point differences only from
    the narrower reduction width.

    packed_caps=(target_cap, source_cap) (requires band_cells) switches to
    the band-PACKED layout (module docstring): target_cap body rows per
    b-cell target window, source_cap lanes per (b+2)-cell guarded source
    strip (9 strips make a program's fused source block). max_per_cell is
    IGNORED (no per-cell slots exist); n_overflow counts window-cap
    violations instead (target drops + missed source slots) and is 0
    whenever the caps cover every window.

    max_blocks=M (requires packed_caps) switches to the occupancy-COMPACTED
    packed layout: kernel programs (and their layout gathers) exist only
    for the first M OCCUPIED windows — a peaked scene (debris annulus:
    ~2% of windows occupied) stops paying grid, DMA and gather cost for
    empty windows, which is what made uniform caps explode there. The
    per-window source neighborhoods are gathered directly (no whole-grid
    strips table, whose [windows, s_cap] footprint also exploded at large
    caps). Bodies in occupied windows beyond M are dropped SYMMETRICALLY
    (target + source roles) and counted into n_overflow, as are source
    lanes past s_cap (counted per fused neighborhood here — a superset of
    the per-strip count of the uncompacted layout). Size M with
    packed_layout_for. Uniform scenes should keep max_blocks=None: the
    static whole-grid trace and chunk-fused strips measure faster when
    ~every window is occupied.

    buckets=((t1, s1, m1), (t2, s2, m2), ...) (requires band_cells;
    excludes packed_caps/max_blocks) switches to the occupancy-BUCKETED
    compacted layout (_packed_bucketed_blocks): each occupied window runs
    in the first bucket whose caps cover it, at that bucket's block
    shape — the bulk of windows stops paying the densest window's cap
    tail. Size with bucketed_layout_for.

    windows_per_block=W (bucketed layout only) packs W windows into each
    Pallas program (_collide_kernel_fused_multi) to amortize per-program
    cost; bit-identical pair set, VMEM-clamped per bucket. Measured
    NEUTRAL at 131k-262k (docs/RESULTS.md round 5) — kept for
    reproducibility; the default 1 is production.

    construction ("auto" | "grid" | "slice") picks the bucket-0 strips
    construction (see _packed_bucketed_blocks): "slice" builds strips by
    contiguous dynamic_slice off a transposed masked operand — measured
    1.34x at 262k; "auto" switches on the strips-table row count.
    """
    n = pos.shape[0]
    g = n_cells
    k = max_per_cell
    n_cols = g * g

    cell_too_small = 2.0 * jnp.max(radius) > box_size / g
    feats = _body_feats(pos, vel, mass, radius, box_size)
    neigh = _column_neighbors(g)
    f32 = jnp.float32

    par = jnp.asarray([[restitution, friction]], f32)
    pair_ops = 60  # ~VPU ops per pair evaluation

    if buckets is not None:
        if band_cells is None:
            raise ValueError("buckets requires band_cells")
        if packed_caps is not None or max_blocks is not None:
            raise ValueError(
                "buckets excludes packed_caps/max_blocks (one layout"
                " switch at a time)"
            )
        out_d, out_e, n_overflow = _packed_bucketed_blocks(
            feats, par, pos, box_size, g, band_cells, buckets, interpret,
            windows_per_block, construction,
        )
        return _epilogue_finish(
            out_d, out_e, pos, vel, mass, n, n_overflow, cell_too_small
        )

    if max_blocks is not None:
        if packed_caps is None or band_cells is None:
            raise ValueError("max_blocks requires band_cells and packed_caps")
        delta, evt, body_slot, n_overflow = _packed_compact_blocks(
            feats, par, pos, box_size, g, band_cells, packed_caps,
            max_blocks, interpret,
        )
        return _collide_epilogue(
            delta, evt, body_slot, pos, vel, mass, n, n_overflow,
            cell_too_small,
        )

    if packed_caps is not None:
        if band_cells is None:
            raise ValueError("packed_caps requires band_cells")
        b = band_cells
        t_cap, s_cap = packed_caps
        n_bands = -(-g // b)
        t_rows = _round_up(max(t_cap, 8), 8)
        s_capw = max(s_cap, 8)  # per-strip lanes (no alignment needed)
        s_rows = _round_up(9 * s_capw, LANE)
        n_tblocks = n_cols * n_bands
        i32 = jnp.int32

        order, starts, cid_sorted = cell_sort(pos, box_size, g)
        # [n + 1, 16] in cell order, row n dead — the one per-row gather
        feats_sorted = jnp.concatenate(
            [feats[order], feats[n:]], axis=0
        )

        # ---- window tables (per column x band) ---------------------------
        cols = jnp.arange(n_cols, dtype=i32)
        w_r = jnp.arange(n_bands, dtype=i32)
        # target window: cells [w b, min((w+1) b, g))
        ts_tab = starts[cols[:, None] * g + w_r[None, :] * b]
        te_tab = starts[
            cols[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
        ]
        cnt_t = te_tab - ts_tab
        n_t_over = jnp.sum(jnp.maximum(cnt_t - t_rows, 0))
        # guarded source window: cells [max(w b - 1, 0), min(w b + b + 1, g))
        ss_tab = starts[
            cols[:, None] * g + jnp.maximum(w_r[None, :] * b - 1, 0)
        ]
        se_tab = starts[
            cols[:, None] * g + jnp.minimum(w_r[None, :] * b + b + 1, g)
        ]
        n_s_over = jnp.sum(jnp.maximum(se_tab - ss_tab - s_capw, 0))
        n_overflow = n_t_over + n_s_over

        # ---- targets: consecutive-run row gather -------------------------
        ar_t = jnp.arange(t_rows, dtype=i32)
        valid_t = ar_t[None, None, :] < jnp.minimum(cnt_t, t_rows)[..., None]
        take_t = ts_tab[..., None] + ar_t
        # gather with the 3D index then reshape: the flat 1D-index form of
        # the same gather measured 4x slower (5.9 vs 1.5 ms at 131k)
        tgt = feats_sorted[
            jnp.where(valid_t, jnp.minimum(take_t, n), n)
        ].reshape(-1, 16)
        # body -> its target-block slot (inverse of the window layout)
        p_r = jnp.arange(n, dtype=i32)
        col_s = cid_sorted // g
        w_own = (cid_sorted - col_s * g) // b
        rank_t = p_r - ts_tab[col_s, w_own]
        slot_sorted = jnp.where(
            rank_t < t_rows,
            (col_s * n_bands + w_own) * t_rows + rank_t,
            n_tblocks * t_rows,
        )
        body_slot = slot_sorted[_invert_order(order, n)]

        # ---- sources: strips once, then whole-chunk fusion ---------------
        # Target-cap-dropped bodies (rank_t >= t_rows) are masked OUT of the
        # source strips too: otherwise partners receive impulses the dropped
        # body never gets back and counted overflow breaks momentum
        # conservation asymmetrically (the banded/full-column layouts drop
        # a table-overflow body from both roles; this keeps packed the same).
        t_ok = jnp.concatenate(
            [rank_t < t_rows, jnp.zeros((1,), bool)]
        )  # [n + 1], indexed by SORTED position
        ar_s = jnp.arange(s_capw, dtype=i32)
        valid_s = (
            ar_s[None, None, :]
            < jnp.minimum(se_tab - ss_tab, s_capw)[..., None]
        )
        take_s = jnp.minimum(ss_tab[..., None] + ar_s, n)
        strips = feats_sorted[
            jnp.where(valid_s & t_ok[take_s], take_s, n)
        ]  # [n_cols, n_bands, s_capw, 16]
        stripsT = strips.transpose(0, 1, 3, 2)  # [.., 16, s_capw]
        dead_strip = jnp.broadcast_to(
            feats[n][:, None], (1, n_bands, 16, s_capw)
        )
        stripsT = jnp.concatenate([stripsT, dead_strip], axis=0)
        # chunk gather: 9 neighbor strips per (column, band), each a
        # contiguous (16 * s_capw)-float copy — streams at HBM bandwidth
        fused = stripsT[neigh]  # [n_cols, 9, n_bands, 16, s_capw]
        fused = fused.transpose(0, 2, 3, 1, 4).reshape(
            n_cols, n_bands, 16, 9 * s_capw
        )
        lane_pad = jnp.broadcast_to(
            feats[n][:, None],
            (n_cols, n_bands, 16, s_rows - 9 * s_capw),
        )
        src = jnp.concatenate([fused, lane_pad], axis=3).reshape(-1, s_rows)

        delta, evt = pl.pallas_call(
            _collide_kernel_fused,
            grid=(n_tblocks,),
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
                jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), f32),
                jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=pair_ops * n_tblocks * t_rows * s_rows,
                bytes_accessed=(n_tblocks * (t_rows * 16 + s_rows * 16
                                             + t_rows * 16)) * 4,
                transcendentals=n_tblocks * t_rows * s_rows,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(par, tgt, src)
        return _collide_epilogue(
            delta, evt, body_slot, pos, vel, mass, n, n_overflow,
            cell_too_small,
        )

    table, _, n_overflow = cell_bin(pos, box_size, g, k)
    # body -> table slot for the epilogue gather (shares cell_bin's sort
    # semantics; the extra cell_sort is ~0.2 ms at 131k)
    order, starts, cid_sorted = cell_sort(pos, box_size, g)
    p_r = jnp.arange(n, dtype=jnp.int32)
    cell_rank = p_r - starts[cid_sorted]
    col_s = cid_sorted // g
    cell_k = cid_sorted - col_s * g

    if band_cells is None:
        # ---- full-column layout: blocks are whole columns, grid (cols, 9),
        # the o axis revisits the outputs, neighbor ids via scalar prefetch
        t_rows = _round_up(max(g * k, 8), LANE)
        s_rows = t_rows
        n_tblocks = n_cols
        # column-major body index table [n_cols, T], padded with n
        col_idx = table.reshape(n_cols, g * k)
        col_idx = jnp.concatenate(
            [col_idx, jnp.full((n_cols, t_rows - g * k), n, jnp.int32)],
            axis=1,
        )
        tgt = feats[col_idx.reshape(-1)]  # [n_cols * T, 16] — the ONE gather
        src_cols = tgt.reshape(n_cols, t_rows, 16).transpose(0, 2, 1)
        # +1 padding block (all dead) for out-of-range neighbors
        pad_col = jnp.broadcast_to(feats[n][:, None], (1, 16, t_rows))
        src = jnp.concatenate([src_cols, pad_col], axis=0).reshape(-1, t_rows)
        # body -> block slot: column block col_s, row cell_k * K + rank
        slot_sorted = jnp.where(
            cell_rank < k,
            col_s * t_rows + cell_k * k + cell_rank,
            n_tblocks * t_rows,
        )
        body_slot = slot_sorted[_invert_order(order, n)]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tblocks, 9),
            in_specs=[
                pl.BlockSpec((1, 2), lambda c, o, nr: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((t_rows, 16), lambda c, o, nr: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, s_rows), lambda c, o, nr: (nr[o, c], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t_rows, 8), lambda c, o, nr: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_rows, 8), lambda c, o, nr: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        delta, evt = pl.pallas_call(
            _collide_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), f32),
                jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=pair_ops * n_tblocks * 9 * t_rows * s_rows,
                bytes_accessed=(n_tblocks * (t_rows * 16 + s_rows * 16 * 9
                                             + t_rows * 16)) * 4,
                transcendentals=n_tblocks * 9 * t_rows * s_rows,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                # The pair math keeps ~16 [T, S] f32 temporaries live: at
                # T = S = 512 that is ~16.4 MB, just past Mosaic's default
                # 16 MB scoped budget. An explicit budget unlocks it (same
                # lever as the gravity kernel's beyond-default tiles).
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
            # neigh ships TRANSPOSED [9, n_cols]: SMEM pads the minor dim
            # to 128 lanes, so [n_cols, 9] would cost n_cols*128 words;
            # [9, ...] pads 9 -> 16 rows instead.
        )(neigh.T, par, tgt, src)
    else:
        # ---- k-banded FUSED layout: B-cell target strips vs the whole 3x3
        # column neighborhood's (B+2)-cell guarded strips, materialized
        # contiguously per (column, band) by one XLA gather. 1D grid,
        # single-visit outputs, no scalar prefetch.
        b = band_cells
        if not 1 <= b <= g:
            raise ValueError(f"band_cells must be in [1, {g}], got {b}")
        n_bands = -(-g // b)
        t_rows = _round_up(b * k, 8)
        s_rows = _round_up(9 * (b + 2) * k, LANE)
        n_tblocks = n_cols * n_bands

        table3 = table.reshape(n_cols, g, k)
        # targets: pad the cell axis to n_bands*b, the row axis to t_rows
        tpad = jnp.full((n_cols, n_bands * b - g, k), n, jnp.int32)
        btgt_idx = jnp.concatenate([table3, tpad], axis=1).reshape(
            n_cols, n_bands, b * k
        )
        rpad = jnp.full((n_cols, n_bands, t_rows - b * k), n, jnp.int32)
        btgt_idx = jnp.concatenate([btgt_idx, rpad], axis=2)
        tgt = feats[btgt_idx.reshape(-1)]  # [n_tblocks * t_rows, 16]
        # body -> block slot: band w = cell_k // b, row
        # (cell_k - w b) K + rank within the (column, band) block
        w_own = cell_k // b
        slot_sorted = jnp.where(
            cell_rank < k,
            (col_s * n_bands + w_own) * t_rows
            + (cell_k - w_own * b) * k + cell_rank,
            n_tblocks * t_rows,
        )
        body_slot = slot_sorted[_invert_order(order, n)]

        # fused source window: for each (column, band), the 9 neighbor
        # columns' cells band*b-1 .. band*b+b (k-guards). Dead cells pad
        # out-of-range k; a virtual all-dead COLUMN pads invalid neighbors.
        dead_cell = jnp.full((n_cols, 1, k), n, jnp.int32)
        table_g2 = jnp.concatenate([dead_cell, table3, dead_cell], axis=1)
        table_g2 = jnp.concatenate(
            [table_g2, jnp.full((1, g + 2, k), n, jnp.int32)], axis=0
        )  # [n_cols + 1, g+2, k]
        band_win = (
            jnp.arange(n_bands, dtype=jnp.int32)[:, None] * b
            + jnp.arange(b + 2, dtype=jnp.int32)[None, :]
        )  # [n_bands, b+2] into the g+2 padded cell axis
        band_win = jnp.minimum(band_win, g + 1)  # clamp tail bands to dead
        # [n_cols, 9, n_bands, b+2, k] -> [n_cols, n_bands, 9*(b+2)*k]
        bsrc_idx = table_g2[neigh][:, :, band_win, :].transpose(
            0, 2, 1, 3, 4
        ).reshape(n_cols, n_bands, 9 * (b + 2) * k)
        spad = jnp.full(
            (n_cols, n_bands, s_rows - 9 * (b + 2) * k), n, jnp.int32
        )
        bsrc_idx = jnp.concatenate([bsrc_idx, spad], axis=2).reshape(-1)
        src = feats[bsrc_idx].reshape(n_tblocks, s_rows, 16).transpose(
            0, 2, 1
        ).reshape(-1, s_rows)

        delta, evt = pl.pallas_call(
            _collide_kernel_fused,
            grid=(n_tblocks,),
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
                jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), f32),
                jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=pair_ops * n_tblocks * t_rows * s_rows,
                bytes_accessed=(n_tblocks * (t_rows * 16 + s_rows * 16
                                             + t_rows * 16)) * 4,
                transcendentals=n_tblocks * t_rows * s_rows,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(par, tgt, src)

    return _collide_epilogue(
        delta, evt, body_slot, pos, vel, mass, n, n_overflow, cell_too_small
    )


def _packed_compact_blocks(
    feats,
    par,
    pos,
    box_size: float,
    n_cells: int,
    band_cells: int,
    packed_caps: tuple[int, int],
    max_blocks: int,
    interpret: bool,
):
    """Occupancy-COMPACTED band-packed layout: one kernel program per
    OCCUPIED (column, band) window, first max_blocks in flat window order
    (see binned_collision_pass docstring).

    Construction differences vs the whole-grid packed layout:
      * the window map is a traced take_rows over the occupancy flags —
        empty windows get no program, no target gather, no source gather;
      * each selected window's fused source block is gathered DIRECTLY from
        its 9 neighbor guarded runs (row gathers, ~9 s_cap rows per
        selected window) instead of through the whole-grid strips table,
        whose [n_windows, s_cap, 16] footprint is exactly what blew up on
        peaked scenes with tail-sized caps;
      * bodies in occupied windows past the max_blocks budget are dropped
        from BOTH roles (counted) — same symmetric-degradation rule as the
        cap drops.
    """
    from nbx.ops.p3m import take_rows

    n = pos.shape[0]
    g = n_cells
    b = band_cells
    n_cols = g * g
    g3 = n_cols * g
    t_cap, s_cap = packed_caps
    n_bands = -(-g // b)
    t_rows = _round_up(max(t_cap, 8), 8)
    s_capw = max(s_cap, 8)
    s_rows = _round_up(9 * s_capw, LANE)
    bmax = max_blocks
    i32 = jnp.int32
    f32 = jnp.float32

    order, starts, cid_sorted = cell_sort(pos, box_size, g)
    feats_sorted = jnp.concatenate([feats[order], feats[n:]], axis=0)

    # ---- window occupancy + selection (flat id = col * n_bands + w) ------
    cols = jnp.arange(n_cols, dtype=i32)
    w_r = jnp.arange(n_bands, dtype=i32)
    ts_tab = starts[cols[:, None] * g + w_r[None, :] * b]
    te_tab = starts[
        cols[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
    ]
    cnt_t = te_tab - ts_tab  # [n_cols, n_bands]
    occ = (cnt_t > 0).reshape(-1)
    wsel, wvalid = take_rows(occ, bmax)  # first bmax occupied windows
    col_sel = wsel // n_bands
    w_sel = wsel - col_sel * n_bands
    wrank = jnp.cumsum(occ.astype(i32)) - 1
    selected = occ & (wrank < bmax)
    n_w_drop = jnp.sum(jnp.where(occ & ~selected, cnt_t.reshape(-1), 0))

    ts_sel = ts_tab[col_sel, w_sel]  # [B]
    cnt_sel = jnp.where(wvalid, cnt_t[col_sel, w_sel], 0)
    n_t_over = jnp.sum(jnp.maximum(cnt_sel - t_rows, 0))

    # ---- targets: consecutive-run row gather per selected window ---------
    ar_t = jnp.arange(t_rows, dtype=i32)
    valid_t = ar_t[None, :] < jnp.minimum(cnt_sel, t_rows)[:, None]
    take_t = jnp.minimum(ts_sel[:, None] + ar_t, n)
    tgt = feats_sorted[jnp.where(valid_t, take_t, n)].reshape(-1, 16)

    # body -> its target-block slot (window rank x t_rows + window rank_t)
    p_r = jnp.arange(n, dtype=i32)
    col_s = cid_sorted // g
    w_own = (cid_sorted - col_s * g) // b
    f_own = col_s * n_bands + w_own
    rank_t = p_r - starts[col_s * g + w_own * b]
    sel_own = selected[f_own]
    slot_sorted = jnp.where(
        sel_own & (rank_t < t_rows),
        wrank[f_own] * t_rows + rank_t,
        bmax * t_rows,
    )
    body_slot = slot_sorted[_invert_order(order, n)]

    # ---- sources: 9 neighbor guarded runs, gathered directly -------------
    # symmetric-drop mask: target-dropped or window-dropped bodies vanish
    # from the source role too (momentum conservation under counted
    # overflow, same rule as the whole-grid packed layout)
    t_ok = jnp.concatenate(
        [sel_own & (rank_t < t_rows), jnp.zeros((1,), bool)]
    )
    lo_cell = jnp.maximum(w_sel * b - 1, 0)  # [B]
    hi_cell = jnp.minimum(w_sel * b + b + 1, g)
    neigh_sel = _column_neighbors_of(col_sel, g)  # [B, 9]; n_cols invalid
    okn = neigh_sel < n_cols
    ss9 = starts[jnp.where(okn, neigh_sel * g + lo_cell[:, None], g3)]
    se9 = starts[jnp.where(okn, neigh_sel * g + hi_cell[:, None], g3)]
    run = se9 - ss9  # [B, 9]
    # counted per fused neighborhood (a strip shared by several selected
    # windows counts once per use) — a conservative superset of the
    # whole-grid layout's per-strip count
    n_s_over = jnp.sum(
        jnp.where(wvalid[:, None], jnp.maximum(run - s_capw, 0), 0)
    )
    ar_s = jnp.arange(s_capw, dtype=i32)
    valid_s = ar_s[None, None, :] < jnp.minimum(run, s_capw)[..., None]
    valid_s = valid_s & wvalid[:, None, None]
    take_s = jnp.minimum(ss9[..., None] + ar_s, n)
    src_rows = feats_sorted[
        jnp.where(valid_s & t_ok[take_s], take_s, n)
    ]  # [B, 9, s_capw, 16]
    src = src_rows.transpose(0, 3, 1, 2).reshape(bmax, 16, 9 * s_capw)
    lane_pad = jnp.broadcast_to(
        feats[n][:, None], (bmax, 16, s_rows - 9 * s_capw)
    )
    src = jnp.concatenate([src, lane_pad], axis=2).reshape(-1, s_rows)

    n_overflow = n_t_over + n_s_over + n_w_drop

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
        interpret=interpret,
    )(par, tgt, src)
    return delta, evt, body_slot, n_overflow


def _bucket_block_geom(t_cap, s_cap, bmax, windows_per_block):
    """Static per-bucket block geometry: (t_rows, s_capw, s_rows, w_blk,
    bmax_pad). w_blk = windows per Pallas program (clamped so one
    program's blocks stay under ~8 MB of VMEM and never exceed the
    bucket's window count); bmax_pad rounds the window budget up to a
    multiple of w_blk (the pad windows are dead-body blocks)."""
    t_rows = _round_up(max(t_cap, 8), 8)
    s_capw = max(s_cap, 8)
    s_rows = _round_up(9 * s_capw, LANE)
    w_blk = 1
    if windows_per_block > 1 and bmax > 1:
        blk_bytes = (t_rows * 16 + 16 * s_rows + 2 * t_rows * 8) * 4
        w_blk = max(
            1, min(windows_per_block, bmax, (8 << 20) // max(blk_bytes, 1))
        )
    bmax_pad = _round_up(bmax, w_blk)
    return t_rows, s_capw, s_rows, w_blk, bmax_pad


def _packed_bucketed_blocks(
    feats,
    par,
    pos,
    box_size: float,
    n_cells: int,
    band_cells: int,
    buckets: tuple[tuple[int, int, int], ...],
    interpret: bool,
    windows_per_block: int = 1,
    construction: str = "auto",
):
    """OCCUPANCY-BUCKETED packed layout: each occupied window is assigned
    to the FIRST bucket whose (t_cap, s_cap) covers its target count and
    max neighbor-strip run AND whose block budget (bmax) still has room —
    windows past a bucket's budget SPILL to the next bucket; the last
    bucket takes every remaining window and is the only place window
    drops happen (overflow counted there); each bucket is one compacted
    pallas_call at its own caps. Single-tier caps must track the densest window's
    extreme-value tail, so the bulk of windows pays ~tail/median extra
    pair lanes; bucketing bounds that cap tax (docs/RESULTS.md
    "N-scaling") and covers peaked scenes without tail-sized uniform caps.

    Construction: bucket 0 (the bulk) builds the whole-grid guarded-strip
    table ONCE at its small cap and gathers each selected window's 9
    strips as whole multi-KB chunks (the fast path on uniform occupancy);
    later buckets (few windows) gather their neighborhoods directly, row
    by row (the compacted construction). The symmetric-drop mask (a body
    dropped from its target role vanishes from ALL buckets' source
    strips) is GLOBAL across buckets, so cross-bucket pairs see the same
    conservation rule as a single layout.

    Returns (out_d [n, 8], out_e [n, 8], n_overflow) in BODY order —
    cross-bucket merged (deltas summed; each body's target slot lives in
    exactly one bucket, the evt merge is a validity pick).
    """
    from nbx.ops.p3m import take_rows

    n = pos.shape[0]
    g = n_cells
    b = band_cells
    n_cols = g * g
    g3 = n_cols * g
    n_bands = -(-g // b)
    i32 = jnp.int32
    f32 = jnp.float32

    order, starts, cid_sorted = cell_sort(pos, box_size, g)
    feats_sorted = jnp.concatenate([feats[order], feats[n:]], axis=0)
    inv = _invert_order(order, n)
    neigh = _column_neighbors(g)  # [n_cols, 9]; n_cols = invalid

    cols = jnp.arange(n_cols, dtype=i32)
    w_r = jnp.arange(n_bands, dtype=i32)
    ts_tab = starts[cols[:, None] * g + w_r[None, :] * b]
    te_tab = starts[
        cols[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
    ]
    cnt_t = te_tab - ts_tab  # [n_cols, n_bands]
    lo = jnp.maximum(w_r * b - 1, 0)  # [n_bands] guarded strip cells
    hi = jnp.minimum(w_r * b + b + 1, g)
    ss9 = starts[jnp.where(
        (neigh < n_cols)[:, None, :],
        neigh[:, None, :] * g + lo[None, :, None], g3,
    )]  # [n_cols, n_bands, 9]
    se9 = starts[jnp.where(
        (neigh < n_cols)[:, None, :],
        neigh[:, None, :] * g + hi[None, :, None], g3,
    )]
    run9 = se9 - ss9
    maxrun = jnp.max(run9, axis=2)  # [n_cols, n_bands]
    occ = cnt_t > 0

    # ---- bucket assignment (first covering bucket; last takes the rest) --
    flags, sels, wranks = [], [], []
    remaining = occ
    for bi, (t_cap, s_cap, bmax) in enumerate(buckets):
        if bi == len(buckets) - 1:
            fl = remaining
        else:
            fl = remaining & (cnt_t <= t_cap) & (maxrun <= s_cap)
        flf = fl.reshape(-1)
        wrank = jnp.cumsum(flf.astype(i32)) - 1
        sel = flf & (wrank < bmax)
        # SPILL, don't drop: a window past this bucket's block budget
        # stays in `remaining` and flows to the NEXT bucket (whose caps
        # get re-checked there); only the last bucket's budget overflow
        # actually drops windows (counted below). Without the spill, an
        # undersized bulk budget silently starves scenes the tail bucket
        # had room for (measured: 0 bounces on a 192-body clustered scene
        # at bucket-0 bmax=24, round 3).
        remaining = remaining & ~sel.reshape(cnt_t.shape)
        flags.append(flf)
        wranks.append(wrank)
        sels.append(sel)

    # ---- global symmetric-drop mask over sorted positions -----------------
    p_r = jnp.arange(n, dtype=i32)
    col_s = cid_sorted // g
    w_own = (cid_sorted - col_s * g) // b
    f_own = col_s * n_bands + w_own
    rank_t = p_r - ts_tab[col_s, w_own]
    ok_sorted = jnp.zeros((n,), bool)
    for sel, (t_cap, _, _) in zip(sels, buckets):
        t_rows = _round_up(max(t_cap, 8), 8)
        ok_sorted = ok_sorted | (sel[f_own] & (rank_t < t_rows))
    t_ok = jnp.concatenate([ok_sorted, jnp.zeros((1,), bool)])

    # cross-bucket epilogue fusion: each body's target slot lives in
    # exactly ONE bucket, so instead of one [n, 8] body-order gather PER
    # bucket (out_d += delta_p[body_slot] — B random gathers of 32 B
    # rows), collect every bucket's kernel outputs into one concatenated
    # table and gather ONCE through a combined slot map (offset per
    # bucket). Bit-identical: the old merge summed exactly one non-zero
    # contribution (deltas) / picked the one non-sentinel row (events).
    deltas, evts = [], []
    m_total = 0
    for (t_cap, s_cap, bmax) in buckets:
        t_r, _, _, _, b_pad = _bucket_block_geom(
            t_cap, s_cap, bmax, windows_per_block
        )
        m_total += b_pad * t_r
    slot_all = jnp.full((n,), m_total, i32)
    slot_base = 0
    n_overflow = jnp.int32(0)
    cnt_flat = cnt_t.reshape(-1)
    for bi, ((t_cap, s_cap, bmax), flf, sel, wrank) in enumerate(
        zip(buckets, flags, sels, wranks)
    ):
        t_rows, s_capw, s_rows, w_blk, bmax_pad = _bucket_block_geom(
            t_cap, s_cap, bmax, windows_per_block
        )
        # window-budget drops: only the LAST bucket drops (earlier
        # buckets spill over-budget windows to the next, see assignment)
        if bi == len(buckets) - 1:
            n_overflow += jnp.sum(jnp.where(flf & ~sel, cnt_flat, 0))
        wsel, wvalid = take_rows(sel, bmax)
        col_sel = wsel // n_bands
        w_sel = wsel - col_sel * n_bands
        ts_sel = ts_tab[col_sel, w_sel]
        cnt_sel = jnp.where(wvalid, cnt_t[col_sel, w_sel], 0)
        n_overflow += jnp.sum(jnp.maximum(cnt_sel - t_rows, 0))
        run_sel = jnp.where(wvalid[:, None], run9[col_sel, w_sel], 0)
        n_overflow += jnp.sum(jnp.maximum(run_sel - s_capw, 0))

        # targets: consecutive-run row gather per selected window
        ar_t = jnp.arange(t_rows, dtype=i32)
        valid_t = ar_t[None, :] < jnp.minimum(cnt_sel, t_rows)[:, None]
        take_t = jnp.minimum(ts_sel[:, None] + ar_t, n)
        tgt = feats_sorted[jnp.where(valid_t, take_t, n)].reshape(-1, 16)

        ar_s = jnp.arange(s_capw, dtype=i32)
        # The whole-grid strips table costs n_cols * n_bands * s_capw rows
        # REGARDLESS of how many windows the bucket serves — on a peaked
        # scene at a fine grid (debris disk, g=128: 0.7% occupancy) that is
        # a multi-GB build for a few thousand windows (measured: remote
        # compile HTTP 500, round 3). Use it only when the bucket's budget
        # covers a substantial fraction of the grid; sparse buckets take
        # the compacted-style direct gathers (the measured-fast path for
        # exactly that shape, docs/RESULTS.md "peaked scenes covered").
        use_grid = bi == 0 and 4 * bmax >= n_cols * n_bands
        if use_grid:
            # bulk: whole-grid strips table, built one of two measured
            # ways (bit-identical; nbx.bench.layoutvar, round 5):
            #   grid-GATHER ("grid"): per-row gathers with the t_ok mask
            #     folded into the index — fastest at 131k (37.7 vs 39.6
            #     ms bucket-0 pass at g=40).
            #   transposed dynamic-SLICE ("slice"/dsT): each strip is ONE
            #     contiguous [16, s_capw] slice off a t_ok-masked,
            #     tail-padded feats.T copy — XLA sees the contiguity the
            #     computed gather index hides, and the strip transpose
            #     pass disappears. 1.34x at 262k (56.2 vs 75.6 ms); the
            #     superlinear construction term was the per-row gather.
            # "auto" switches on the strips-table row count (the gather's
            # scaling variable); the 6e5 threshold sits between 131k
            # g=40 B=8 (5.1e5 rows, grid best by ~5%) and 131k B=12
            # (6.7e5, slice best by ~10%) / 262k (9.5e5, slice 1.15x).
            ss_own = starts[cols[:, None] * g + lo[None, :]]
            se_own = starts[cols[:, None] * g + hi[None, :]]
            valid_so = (
                ar_s[None, None, :]
                < jnp.minimum(se_own - ss_own, s_capw)[..., None]
            )
            use_slice = construction == "slice" or (
                construction == "auto"
                and n_cols * n_bands * s_capw >= 600_000
            )
            if use_slice:
                dead = feats[n]
                op = jnp.concatenate(
                    [jnp.where(t_ok[:n, None], feats_sorted[:n], dead),
                     jnp.broadcast_to(dead[None], (s_capw + 1, 16))], 0)
                opT = op.T  # [16, n + s_capw + 1]
                stripsT = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(
                        opT, (0, s), (16, s_capw))
                )(ss_own.reshape(-1)).reshape(n_cols, n_bands, 16, s_capw)
                stripsT = jnp.where(
                    valid_so[:, :, None, :], stripsT, dead[:, None])
            else:
                take_so = jnp.minimum(ss_own[..., None] + ar_s, n)
                strips = feats_sorted[
                    jnp.where(valid_so & t_ok[take_so], take_so, n)
                ]  # [n_cols, n_bands, s_capw, 16]
                stripsT = strips.transpose(0, 1, 3, 2)
            dead_strip = jnp.broadcast_to(
                feats[n][:, None], (1, n_bands, 16, s_capw)
            )
            stripsT = jnp.concatenate([stripsT, dead_strip], axis=0)
            fused = stripsT[neigh[col_sel], w_sel[:, None]]
            src = fused.transpose(0, 2, 1, 3).reshape(
                bmax, 16, 9 * s_capw
            )
        else:
            # tail: few windows — direct per-window neighborhood gathers
            lo_c = jnp.maximum(w_sel * b - 1, 0)
            hi_c = jnp.minimum(w_sel * b + b + 1, g)
            neigh_sel = _column_neighbors_of(col_sel, g)
            okn = neigh_sel < n_cols
            ss = starts[jnp.where(okn, neigh_sel * g + lo_c[:, None], g3)]
            se = starts[jnp.where(okn, neigh_sel * g + hi_c[:, None], g3)]
            valid_s = (
                ar_s[None, None, :]
                < jnp.minimum(se - ss, s_capw)[..., None]
            ) & wvalid[:, None, None]
            take_s = jnp.minimum(ss[..., None] + ar_s, n)
            rows = feats_sorted[
                jnp.where(valid_s & t_ok[take_s], take_s, n)
            ]  # [bmax, 9, s_capw, 16]
            src = rows.transpose(0, 3, 1, 2).reshape(bmax, 16, 9 * s_capw)
        lane_pad = jnp.broadcast_to(
            feats[n][:, None], (bmax, 16, s_rows - 9 * s_capw)
        )
        src = jnp.concatenate([src, lane_pad], axis=2).reshape(-1, s_rows)

        if bmax_pad > bmax:
            # dead-window pad up to a multiple of w_blk (mass 0 ->
            # every pair in a pad window is masked; its output rows are
            # unreachable through the slot map below)
            n_pad = bmax_pad - bmax
            tgt = jnp.concatenate(
                [tgt, jnp.broadcast_to(feats[n][None],
                                       (n_pad * t_rows, 16))], axis=0)
            src = jnp.concatenate(
                [src, jnp.broadcast_to(feats[n][None, :, None],
                                       (n_pad, 16, s_rows)
                                       ).reshape(-1, s_rows)], axis=0)

        kern = (_collide_kernel_fused if w_blk == 1 else
                functools.partial(_collide_kernel_fused_multi, n_w=w_blk))
        delta, evt = pl.pallas_call(
            kern,
            grid=(bmax_pad // w_blk,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((w_blk * t_rows, 16), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_blk * 16, s_rows), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((w_blk * t_rows, 8), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_blk * t_rows, 8), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bmax_pad * t_rows, 8), f32),
                jax.ShapeDtypeStruct((bmax_pad * t_rows, 8), f32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=60 * bmax_pad * t_rows * s_rows,
                bytes_accessed=(bmax_pad * (t_rows * 16 + s_rows * 16
                                            + t_rows * 16)) * 4,
                transcendentals=bmax_pad * t_rows * s_rows,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(par, tgt, src)

        deltas.append(delta)
        evts.append(evt)
        slot_all = jnp.where(
            sel[f_own] & (rank_t < t_rows),
            slot_base + wrank[f_own] * t_rows + rank_t,
            slot_all,
        )
        slot_base += bmax_pad * t_rows

    # ONE body-order gather over the concatenated tables (see above)
    delta_all = jnp.concatenate(deltas + [jnp.zeros((1, 8), f32)], axis=0)
    evt_all = jnp.concatenate(
        evts + [jnp.full((1, 8), DEPTH_SENTINEL, f32)], axis=0
    )
    body_slot = slot_all[inv]
    return delta_all[body_slot], evt_all[body_slot], n_overflow


def _invert_order(order, n):
    """Body id -> sorted position (inverse permutation of cell_sort).

    argsort, not the arange-scatter: on v5e the scatter form measured
    3.7x (131k) to 4.1x (1M) slower (nbx.bench.microops — sorts are fine
    on this chip, scatters are poison; docs/RESULTS.md round 3)."""
    del n
    return jnp.argsort(order).astype(jnp.int32)


def _collide_epilogue(
    delta, evt, body_slot, pos, vel, mass, n, n_overflow, cell_too_small
):
    """Map kernel outputs back to body order and rebuild the per-body
    deepest-partner record.

    body_slot [n] is each body's target-block slot (M = rows of delta for
    bodies with no slot — dead-dropped or cap-dropped). Every layout can
    COMPUTE it from the cell sort (slot = f(sorted position)), so the
    write-back is two n-row GATHERS — the original implementation
    scattered the (3x larger, padding included) block outputs back to
    body order and that scatter alone cost ~16 ms of a 59 ms step at 131k
    (TPU scatter serializes; same lesson as the layout construction)."""
    f32 = jnp.float32
    m = delta.shape[0]
    delta_p = jnp.concatenate([delta, jnp.zeros((1, 8), f32)], axis=0)
    evt_p = jnp.concatenate(
        [evt, jnp.full((1, 8), DEPTH_SENTINEL, f32)], axis=0
    )
    slot = jnp.clip(body_slot, 0, m)
    out_d = delta_p[slot]
    out_e = evt_p[slot]
    return _epilogue_finish(
        out_d, out_e, pos, vel, mass, n, n_overflow, cell_too_small
    )


def _epilogue_finish(
    out_d, out_e, pos, vel, mass, n, n_overflow, cell_too_small
):
    """Final epilogue step shared by every layout: split the per-body
    delta rows and rebuild the deepest-partner record (see
    _collide_epilogue for why the recompute is O(N) gathers)."""
    f32 = jnp.float32
    dvel = out_d[:n, 0:3]
    dpos = out_d[:n, 3:6]
    dtemp = out_d[:n, 6]
    n_bounces = (jnp.sum(out_d[:n, 7]) / 2.0).astype(jnp.int32)

    # ---- recompute the winner's pair quantities O(N) from (i, j) ----------
    # The kernel only reports (depth, j); vn/Q/E/m_j/approaching follow from
    # the PRE-PASS state exactly as the kernel would have computed them
    # (same formulas; fp association may differ in the last ulp).
    has = out_e[:n, 0] > 0.0
    j_idx = jnp.where(has, out_e[:n, 1].astype(jnp.int32), -1)
    jc = jnp.clip(j_idx, 0, n - 1)
    d = pos[jc] - pos
    r2b = jnp.sum(d * d, axis=-1)
    invb = jax.lax.rsqrt(jnp.where(r2b > 0.0, r2b, 1.0))
    vnb = jnp.sum((vel[jc] - vel) * d, axis=-1) * invb
    m_j = mass[jc]
    m_sum = mass + m_j
    r_msb = 1.0 / jnp.where(m_sum > 0.0, m_sum, 1.0)
    e_b = 0.5 * (mass * m_j * r_msb) * vnb * vnb  # impact energy (L333)
    best = dict(
        j=j_idx,
        vn=jnp.where(has, vnb, 0.0).astype(f32),
        q=jnp.where(has, e_b * r_msb, 0.0).astype(f32),  # L338
        energy=jnp.where(has, e_b, 0.0).astype(f32),
        m_j=jnp.where(has, m_j, 0.0).astype(f32),
        approaching=has & (vnb < 0.0),
    )
    return dvel, dpos, dtemp, best, n_bounces, n_overflow, cell_too_small


def _column_neighbors_of(cc, g: int):
    """9-neighborhood column ids [..., 9] for column ids cc (traced ok);
    invalid offsets -> g*g. KEEP IN SYNC with _column_neighbors: the
    sharded slab layout's bit-identity with the single-chip blocks
    depends on identical (di, dj) enumeration. (Not deduplicated on
    purpose — the single-chip packed trace is XLA-sensitive: an
    equivalent-looking refactor of it measured +8 ms at 131k.)"""
    n_cols = g * g
    ci, cj = cc // g, cc % g
    neigh = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ni, nj = ci + di, cj + dj
            ok = (ni >= 0) & (ni < g) & (nj >= 0) & (nj < g)
            neigh.append(jnp.where(ok, ni * g + nj, n_cols))
    return jnp.stack(neigh, axis=-1)


def packed_collision_blocks_slab(  # KEEP pallas_call spec in sync with
    # binned_collision_pass's packed branch (same kernel, same tiling,
    # same vmem budget) — the slab blocks must compile like the
    # single-chip ones
    pos,
    vel,
    mass,
    radius,
    box_size: float,
    n_cells: int,
    band_cells: int,
    packed_caps: tuple[int, int],
    restitution,
    friction,
    col_lo,  # first (i, j) column of this SLAB — TRACED (axis_index)
    n_slab_cols: int,  # columns in the slab (static)
    interpret: bool = False,
):
    """Band-packed layout + kernel for the column slab [col_lo, col_lo +
    n_slab_cols) — the per-chip building block of the SHARDED collision
    pass (nbx.parallel.shard.make_sharded_binned_collision_pass). Source
    strips are built for the slab's +-(g+1)-column superset (clamped;
    out-of-grid ids map to empty windows), so slab block contents are
    bit-identical to the same blocks of a whole-grid build.

    The single-device pass keeps its own whole-grid construction in
    binned_collision_pass: this function's traced col_lo makes every
    table offset dynamic, which measured ~8 ms slower at 131k than the
    static whole-grid trace — fine per-chip (amortized 1/D), wrong as
    the single-chip default.

    Returns (delta [B*T, 8], evt [B*T, 8], body_slot [N] (>= B*T for
    bodies with no slot in THIS slab), n_overflow over slab windows).
    """
    n = pos.shape[0]
    g = n_cells
    b = band_cells
    n_cols = g * g
    g3 = n_cols * g
    t_cap, s_cap = packed_caps
    n_bands = -(-g // b)
    t_rows = _round_up(max(t_cap, 8), 8)
    s_capw = max(s_cap, 8)
    s_rows = _round_up(9 * s_capw, LANE)
    n_tblocks = n_slab_cols * n_bands
    i32 = jnp.int32
    f32 = jnp.float32
    col_lo = jnp.asarray(col_lo, i32)

    feats = _body_feats(pos, vel, mass, radius, box_size)
    par = jnp.asarray([[restitution, friction]], f32)
    order, starts, cid_sorted = cell_sort(pos, box_size, g)
    feats_sorted = jnp.concatenate([feats[order], feats[n:]], axis=0)

    # ---- window tables (slab columns x bands) ----------------------------
    cols = col_lo + jnp.arange(n_slab_cols, dtype=i32)
    w_r = jnp.arange(n_bands, dtype=i32)
    ts_tab = starts[cols[:, None] * g + w_r[None, :] * b]
    te_tab = starts[
        cols[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
    ]
    cnt_t = te_tab - ts_tab
    n_t_over = jnp.sum(jnp.maximum(cnt_t - t_rows, 0))
    lo_cell = jnp.maximum(w_r * b - 1, 0)
    hi_cell = jnp.minimum(w_r * b + b + 1, g)

    # ---- source-window tables over the slab's column SUPERSET ------------
    n_super = n_slab_cols + 2 * (g + 1)
    sup_lo = col_lo - (g + 1)
    sup_cols = sup_lo + jnp.arange(n_super, dtype=i32)
    sup_ok = (sup_cols >= 0) & (sup_cols < n_cols)
    sc = jnp.where(sup_ok, sup_cols, 0)
    ss_tab = starts[
        jnp.where(sup_ok[:, None], sc[:, None] * g + lo_cell[None, :], g3)
    ]
    se_tab = starts[
        jnp.where(sup_ok[:, None], sc[:, None] * g + hi_cell[None, :], g3)
    ]
    # overflow counted over the SLAB's own columns (superset rows
    # [g + 1, g + 1 + n_slab)) so per-chip psums add to the global count
    slab_rows = jax.lax.dynamic_slice_in_dim(
        se_tab - ss_tab, g + 1, n_slab_cols, 0
    )
    n_s_over = jnp.sum(jnp.maximum(slab_rows - s_capw, 0))
    n_overflow = n_t_over + n_s_over

    # ---- targets: consecutive-run row gather -----------------------------
    ar_t = jnp.arange(t_rows, dtype=i32)
    valid_t = ar_t[None, None, :] < jnp.minimum(cnt_t, t_rows)[..., None]
    take_t = ts_tab[..., None] + ar_t
    tgt = feats_sorted[
        jnp.where(valid_t, jnp.minimum(take_t, n), n)
    ].reshape(-1, 16)
    # body -> target-block slot; non-slab bodies get the sentinel
    p_r = jnp.arange(n, dtype=i32)
    col_s = cid_sorted // g
    w_own = (cid_sorted - col_s * g) // b
    in_slab = (col_s >= col_lo) & (col_s < col_lo + n_slab_cols)
    col_rel = jnp.clip(col_s - col_lo, 0, n_slab_cols - 1)
    rank_t = p_r - ts_tab[col_rel, w_own]
    slot_sorted = jnp.where(
        in_slab & (rank_t < t_rows),
        (col_rel * n_bands + w_own) * t_rows + rank_t,
        n_tblocks * t_rows,
    )
    body_slot = slot_sorted[_invert_order(order, n)]

    # ---- sources: superset strips once, whole-chunk fusion ---------------
    # Mask target-cap-dropped bodies out of the source role, using the
    # GLOBAL window rank (a body can be target-dropped in another chip's
    # slab yet sourced here) — keeps slab blocks bit-identical to the
    # single-chip packed build, which applies the same mask.
    rank_g = p_r - starts[col_s * g + w_own * b]
    t_ok = jnp.concatenate(
        [rank_g < t_rows, jnp.zeros((1,), bool)]
    )  # [n + 1], indexed by SORTED position
    ar_s = jnp.arange(s_capw, dtype=i32)
    valid_s = (
        ar_s[None, None, :]
        < jnp.minimum(se_tab - ss_tab, s_capw)[..., None]
    )
    take_s = jnp.minimum(ss_tab[..., None] + ar_s, n)
    strips = feats_sorted[
        jnp.where(valid_s & t_ok[take_s], take_s, n)
    ]  # [n_super, n_bands, s_capw, 16]
    stripsT = strips.transpose(0, 1, 3, 2)
    dead_strip = jnp.broadcast_to(
        feats[n][:, None], (1, n_bands, 16, s_capw)
    )
    stripsT = jnp.concatenate([stripsT, dead_strip], axis=0)
    neigh_g = _column_neighbors_of(cols, g)  # [n_slab, 9]; n_cols invalid
    loc = jnp.where(neigh_g < n_cols, neigh_g - sup_lo, n_super)
    fused = stripsT[loc]  # [n_slab, 9, n_bands, 16, s_capw]
    fused = fused.transpose(0, 2, 3, 1, 4).reshape(
        n_slab_cols, n_bands, 16, 9 * s_capw
    )
    lane_pad = jnp.broadcast_to(
        feats[n][:, None],
        (n_slab_cols, n_bands, 16, s_rows - 9 * s_capw),
    )
    src = jnp.concatenate([fused, lane_pad], axis=3).reshape(-1, s_rows)

    delta, evt = pl.pallas_call(
        _collide_kernel_fused,
        grid=(n_tblocks,),
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
            jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * n_tblocks * t_rows * s_rows,
            bytes_accessed=(n_tblocks * (t_rows * 16 + s_rows * 16
                                         + t_rows * 16)) * 4,
            transcendentals=n_tblocks * t_rows * s_rows,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(par, tgt, src)
    return delta, evt, body_slot, n_overflow


def epilogue_rows(delta, evt, body_slot):
    """Per-body (delta row, event row) by slot gather: [n, 8] x2. Bodies
    with no slot (body_slot >= rows) read the zero / sentinel padding row
    — under a sharded slab split, masking these to zero and psum-ing over
    chips reconstructs the whole-grid rows exactly (each body has a slot
    on exactly one chip)."""
    f32 = jnp.float32
    m = delta.shape[0]
    delta_p = jnp.concatenate([delta, jnp.zeros((1, 8), f32)], axis=0)
    evt_p = jnp.concatenate(
        [evt, jnp.full((1, 8), DEPTH_SENTINEL, f32)], axis=0
    )
    slot = jnp.clip(body_slot, 0, m)
    return delta_p[slot], evt_p[slot]


def cell_sort_slabgrid(pos, alive, box_size: float, n_cells: int,
                       x0_cell, gx: int, y0_cell=0, gy: int | None = None):
    """cell_sort over a LOCAL slab grid [gx, gy, g] whose x origin is the
    global cell layer x0_cell (TRACED — per-chip axis_index arithmetic):
    local lx = clip-to-box(global cx) - x0_cell, y/z as in cell_sort.
    With gy (default: the full g), the y axis is likewise a local window
    at traced origin y0_cell — the 2D (x, y) slab decomposition. Rows
    with lx/ly outside the local grid or alive=False map to the overflow
    cell gx*gy*g — parked at the END of the sort, never targeted or
    sourced. (Dead slots are parked deliberately, unlike the whole-grid
    sort where they occupy real cells: the halo-exchange step reuses
    slots freely and corpses must not eat window caps.)

    Returns (order [N] i32, starts [gx*gy*g + 1] i32, cid_sorted [N] i32).
    """
    n = pos.shape[0]
    g = n_cells
    if gy is None:
        gy = g
    h = box_size / g
    ijk = jnp.clip((pos / h).astype(jnp.int32), 0, g - 1)
    lx = ijk[:, 0] - jnp.asarray(x0_cell, jnp.int32)
    ly = ijk[:, 1] - jnp.asarray(y0_cell, jnp.int32)
    n_cells_loc = gx * gy * g
    cid = jnp.where(
        alive & (lx >= 0) & (lx < gx) & (ly >= 0) & (ly < gy),
        (lx * gy + ly) * g + ijk[:, 2],
        n_cells_loc,
    )
    order = jnp.argsort(cid).astype(jnp.int32)
    cid_sorted = cid[order]
    starts = jnp.searchsorted(
        cid_sorted, jnp.arange(n_cells_loc + 1)
    ).astype(jnp.int32)
    return order, starts, cid_sorted


def _column_neighbors_rect(gx: int, gy: int):
    """9-neighborhood column ids [gx*gy, 9] on a RECTANGULAR (x, y) column
    grid; invalid offsets -> gx*gy (the dead column). Same (di, dj)
    enumeration as _column_neighbors (tie-break layout-invariance)."""
    n_cols = gx * gy
    cc = jnp.arange(n_cols, dtype=jnp.int32)
    ci, cj = cc // gy, cc % gy
    neigh = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ni, nj = ci + di, cj + dj
            ok = (ni >= 0) & (ni < gx) & (nj >= 0) & (nj < gy)
            neigh.append(jnp.where(ok, ni * gy + nj, n_cols))
    return jnp.stack(neigh, axis=1)


def packed_collision_blocks_local(  # KEEP pallas_call spec in sync with
    # binned_collision_pass's packed branch (same kernel, same tiling,
    # same vmem budget)
    pos,
    vel,
    mass,
    radius,
    box_size: float,
    n_cells: int,
    band_cells: int,
    packed_caps: tuple[int, int],
    restitution,
    friction,
    x0_cell,  # global x cell layer of LOCAL layer 0 (= slab_lo - 1) — TRACED
    slab_x: int,  # owned x layers (static); local grid is [slab_x + 2, g, g]
    interpret: bool = False,
    y0_cell=0,  # with slab_y: global y layer of LOCAL y 0 — TRACED
    slab_y: int | None = None,  # owned y layers (static): 2D slab grid
    #   [slab_x + 2, slab_y + 2, g]; None = the y axis stays whole (1D)
    short_gravity=None,  # (G, a, eps) dynamic scalars: ALSO accumulate the
    #   P3M erfc short-range gravity over the same pair blocks
    #   (_collide_kernel_fused_grav); the return gains a grav element
):
    """Band-packed layout + fused kernel over a LOCAL slab grid — the
    per-chip building block of the HALO-EXCHANGE sharded granular step
    (nbx.parallel.spatial). Unlike packed_collision_blocks_slab (which
    takes the fully GATHERED body set and walks global tables at a traced
    column offset), this takes only the chip's OWN body slots plus its
    x-halo rows ([nl + 2H] arrays, any order) and bins them into a
    [slab_x + 2, g, g] local grid: global x cell layer x0_cell maps to
    local layer 0 (the left halo layer), owned layers are [1, slab_x + 1),
    layer slab_x + 1 is the right halo. With slab_y, the y axis is ALSO a
    local window ([slab_x + 2, slab_y + 2, g] grid at traced origin
    (x0_cell, y0_cell)) — the 2D slab decomposition for meshes wider than
    the grid's x layer count; the caller's halo rows must then cover both
    boundary x-layers and boundary y-layers INCLUDING the diagonal
    corners. TARGET windows cover only the owned layers' columns; source
    strips cover ALL local columns, so owned targets see their +-1
    neighbors through the halo rows. Every
    table index is static (the traced offset only shifts per-body cell
    ids), so the construction compiles like the single-chip packed trace
    scaled to ~slab_x/g of the grid — per-chip memory O(nl + halo), no
    O(N) gathered state anywhere.

    Pair-set parity with the whole-grid packed build (zero overflow):
    identical cells, identical guarded windows — gated by
    tests/test_spatial.py. Under TARGET-cap overflow the drop set of a
    boundary window is decided by the LOCAL sort order, which can differ
    from the neighboring chip's order for its halo copy of the same
    window; overflow is counted (no-silent-caps) and zero-overflow caps
    (packed_caps_for) give layout-invariant results. Partner tie-breaks
    on bitwise-equal depths use LOCAL ids and can likewise differ at the
    halo boundary (the mutual gate then simply fails: bounce-only, no
    event) — same documented class as the cross-chunk tie rule.

    Returns (delta [B*T, 8], evt [B*T, 8], body_slot [nl + 2H] (sentinel
    for halo/overflow/dead rows), n_overflow over OWNED windows); with
    short_gravity set, (delta, evt, grav [B*T, 8], body_slot, n_overflow).
    """
    n = pos.shape[0]
    g = n_cells
    b = band_cells
    w_x = slab_x
    gx = w_x + 2
    two_d = slab_y is not None
    w_y = slab_y if two_d else g
    gy = w_y + 2 if two_d else g
    t_cap, s_cap = packed_caps
    n_bands = -(-g // b)
    t_rows = _round_up(max(t_cap, 8), 8)
    s_capw = max(s_cap, 8)
    s_rows = _round_up(9 * s_capw, LANE)
    n_cols_loc = gx * gy
    n_cols_own = w_x * w_y
    n_tblocks = n_cols_own * n_bands
    i32 = jnp.int32
    f32 = jnp.float32

    feats = _body_feats(pos, vel, mass, radius, box_size)
    par = _collide_par(restitution, friction, short_gravity)
    order, starts, cid_sorted = cell_sort_slabgrid(
        pos, mass > 0.0, box_size, g, x0_cell, gx,
        y0_cell if two_d else 0, gy,
    )
    feats_sorted = jnp.concatenate([feats[order], feats[n:]], axis=0)

    # ---- window tables: targets over OWNED columns ------------------------
    # 1D: x layers [1, w_x + 1), all y — ids [gy, gy + w_x*gy) contiguous.
    # 2D: x layers [1, w_x + 1) AND y layers [1, w_y + 1).
    if two_d:
        ox = 1 + jnp.arange(w_x, dtype=i32)
        oy = 1 + jnp.arange(w_y, dtype=i32)
        cols_own = (ox[:, None] * gy + oy[None, :]).reshape(-1)
    else:
        cols_own = gy + jnp.arange(n_cols_own, dtype=i32)
    w_r = jnp.arange(n_bands, dtype=i32)
    ts_tab = starts[cols_own[:, None] * g + w_r[None, :] * b]
    te_tab = starts[
        cols_own[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
    ]
    cnt_t = te_tab - ts_tab
    n_t_over = jnp.sum(jnp.maximum(cnt_t - t_rows, 0))
    lo_cell = jnp.maximum(w_r * b - 1, 0)
    hi_cell = jnp.minimum(w_r * b + b + 1, g)

    # ---- source-window tables over ALL local columns ---------------------
    cols_all = jnp.arange(n_cols_loc, dtype=i32)
    ss_tab = starts[cols_all[:, None] * g + lo_cell[None, :]]
    se_tab = starts[cols_all[:, None] * g + hi_cell[None, :]]
    # source overflow counted over OWNED columns only: each boundary
    # window is owned by exactly one chip, so per-chip psums add up to a
    # whole-grid count without double-counting halo copies
    if two_d:
        own_rows = (se_tab - ss_tab)[cols_own]
    else:
        own_rows = jax.lax.slice_in_dim(
            se_tab - ss_tab, gy, gy + n_cols_own, 1, 0
        )
    n_s_over = jnp.sum(jnp.maximum(own_rows - s_capw, 0))
    n_overflow = n_t_over + n_s_over

    # ---- targets: consecutive-run row gather -----------------------------
    ar_t = jnp.arange(t_rows, dtype=i32)
    valid_t = ar_t[None, None, :] < jnp.minimum(cnt_t, t_rows)[..., None]
    take_t = ts_tab[..., None] + ar_t
    tgt = feats_sorted[
        jnp.where(valid_t, jnp.minimum(take_t, n), n)
    ].reshape(-1, 16)
    # body -> target-block slot; halo/overflow/dead rows get the sentinel
    p_r = jnp.arange(n, dtype=i32)
    col_s = cid_sorted // g  # n_cols_loc for overflow-parked rows
    w_own = jnp.minimum(cid_sorted - col_s * g, g - 1) // b
    if two_d:
        cxl = col_s // gy
        cyl = col_s - cxl * gy
        owned = (
            (cxl >= 1) & (cxl < w_x + 1) & (cyl >= 1) & (cyl < w_y + 1)
        )
        col_rel = jnp.clip(
            (cxl - 1) * w_y + (cyl - 1), 0, n_cols_own - 1
        )
    else:
        owned = (col_s >= gy) & (col_s < gy + n_cols_own)
        col_rel = jnp.clip(col_s - gy, 0, n_cols_own - 1)
    rank_t = p_r - ts_tab[col_rel, w_own]
    slot_sorted = jnp.where(
        owned & (rank_t < t_rows),
        (col_rel * n_bands + w_own) * t_rows + rank_t,
        n_tblocks * t_rows,
    )
    body_slot = slot_sorted[_invert_order(order, n)]

    # ---- sources: strips for all local columns, whole-chunk fusion -------
    # target-cap-dropped bodies masked out of the source role by their
    # LOCAL window rank (halo rows use their halo-window rank) — keeps
    # counted overflow momentum-symmetric within this chip's blocks
    rank_w = p_r - starts[jnp.minimum(col_s * g + w_own * b, n_cols_loc * g)]
    t_ok = jnp.concatenate(
        [(rank_w < t_rows) & (col_s < n_cols_loc), jnp.zeros((1,), bool)]
    )  # [n + 1], indexed by SORTED position
    ar_s = jnp.arange(s_capw, dtype=i32)
    valid_s = (
        ar_s[None, None, :]
        < jnp.minimum(se_tab - ss_tab, s_capw)[..., None]
    )
    take_s = jnp.minimum(ss_tab[..., None] + ar_s, n)
    strips = feats_sorted[
        jnp.where(valid_s & t_ok[take_s], take_s, n)
    ]  # [n_cols_loc, n_bands, s_capw, 16]
    stripsT = strips.transpose(0, 1, 3, 2)
    dead_strip = jnp.broadcast_to(
        feats[n][:, None], (1, n_bands, 16, s_capw)
    )
    stripsT = jnp.concatenate([stripsT, dead_strip], axis=0)
    neigh = _column_neighbors_rect(gx, gy)[cols_own]  # [own, 9]
    fused = stripsT[neigh]  # [own, 9, n_bands, 16, s_capw]
    fused = fused.transpose(0, 2, 3, 1, 4).reshape(
        n_cols_own, n_bands, 16, 9 * s_capw
    )
    lane_pad = jnp.broadcast_to(
        feats[n][:, None],
        (n_cols_own, n_bands, 16, s_rows - 9 * s_capw),
    )
    src = jnp.concatenate([fused, lane_pad], axis=3).reshape(-1, s_rows)

    kern, g_specs, g_shapes, par_w = _grav_pallas_extras(
        short_gravity, t_rows, s_rows, n_tblocks
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_tblocks,),
        in_specs=[
            pl.BlockSpec((1, par_w), lambda c: (0, 0),
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
        ] + g_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tblocks * t_rows, 8), jnp.float32),
        ] + g_shapes,
        cost_estimate=pl.CostEstimate(
            flops=60 * n_tblocks * t_rows * s_rows,
            bytes_accessed=(n_tblocks * (t_rows * 16 + s_rows * 16
                                         + t_rows * 16)) * 4,
            transcendentals=n_tblocks * t_rows * s_rows,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(par, tgt, src)
    if short_gravity is not None:
        delta, evt, grav = outs
        return delta, evt, grav, body_slot, n_overflow
    delta, evt = outs
    return delta, evt, body_slot, n_overflow


def bucketed_collision_blocks_local(
    pos,
    vel,
    mass,
    radius,
    box_size: float,
    n_cells: int,
    band_cells: int,
    buckets: tuple[tuple[int, int, int], ...],
    restitution,
    friction,
    x0_cell,
    slab_x: int,
    interpret: bool = False,
    y0_cell=0,
    slab_y: int | None = None,
    short_gravity=None,  # (G, a, eps): fuse the P3M erfc short-range sum
    #   (_collide_kernel_fused_grav); the return gains an out_g element
    construction: str = "auto",  # bucket-0 strips build (see
    #   _packed_bucketed_blocks): "grid" | "slice" | size-based "auto"
):
    """Occupancy-BUCKETED variant of packed_collision_blocks_local: the
    local slab grid's OWNED windows run in the first bucket whose caps
    cover them (see _packed_bucketed_blocks for the bucket machinery and
    bucketed_layout_for for sizing) — the spatial halo-exchange step's
    answer to the cap tax. KEEP the table construction in sync with
    packed_collision_blocks_local (deliberate duplication: the packed
    local trace is parity-gated and XLA-sensitive, same policy as
    _column_neighbors_of).

    Returns (out_d [n, 8], out_e [n, 8], n_overflow-over-owned-windows) in
    LOCAL row order (owned rows first, then halo rows — halo rows read the
    zero/sentinel padding). Divergence note: a HALO row's symmetric-drop
    rank check uses the LAST bucket's t_rows (its owner's bucket choice
    depends on occupancy this chip cannot see); under zero overflow the
    masks agree exactly — the counted-overflow divergence class of the
    packed local builder.
    """
    n = pos.shape[0]
    g = n_cells
    b = band_cells
    w_x = slab_x
    gx = w_x + 2
    two_d = slab_y is not None
    w_y = slab_y if two_d else g
    gy = w_y + 2 if two_d else g
    n_bands = -(-g // b)
    n_cols_loc = gx * gy
    n_cols_own = w_x * w_y
    g3 = n_cols_loc * g
    n_w = n_cols_own * n_bands
    i32 = jnp.int32
    f32 = jnp.float32

    from nbx.ops.p3m import take_rows

    feats = _body_feats(pos, vel, mass, radius, box_size)
    par = _collide_par(restitution, friction, short_gravity)
    order, starts, cid_sorted = cell_sort_slabgrid(
        pos, mass > 0.0, box_size, g, x0_cell, gx,
        y0_cell if two_d else 0, gy,
    )
    feats_sorted = jnp.concatenate([feats[order], feats[n:]], axis=0)
    inv = _invert_order(order, n)

    # ---- owned columns + window tables ------------------------------------
    if two_d:
        ox = 1 + jnp.arange(w_x, dtype=i32)
        oy = 1 + jnp.arange(w_y, dtype=i32)
        cols_own = (ox[:, None] * gy + oy[None, :]).reshape(-1)
    else:
        cols_own = gy + jnp.arange(n_cols_own, dtype=i32)
    w_r = jnp.arange(n_bands, dtype=i32)
    ts_tab = starts[cols_own[:, None] * g + w_r[None, :] * b]
    te_tab = starts[
        cols_own[:, None] * g + jnp.minimum(w_r[None, :] * b + b, g)
    ]
    cnt_t = te_tab - ts_tab  # [n_cols_own, n_bands]
    lo_cell = jnp.maximum(w_r * b - 1, 0)
    hi_cell = jnp.minimum(w_r * b + b + 1, g)
    cols_all = jnp.arange(n_cols_loc, dtype=i32)
    ss_tab = starts[cols_all[:, None] * g + lo_cell[None, :]]
    se_tab = starts[cols_all[:, None] * g + hi_cell[None, :]]
    runs_all = se_tab - ss_tab  # [n_cols_loc, n_bands]
    neigh_own = _column_neighbors_rect(gx, gy)[cols_own]  # [own, 9]
    runs_pad = jnp.concatenate(
        [runs_all, jnp.zeros((1, n_bands), i32)], axis=0
    )
    run9 = runs_pad[
        jnp.where(neigh_own < n_cols_loc, neigh_own, n_cols_loc)
    ]  # [own, 9, n_bands]
    maxrun = jnp.max(run9, axis=1)  # [own, n_bands]
    occ = cnt_t > 0

    # ---- bucket assignment over OWNED windows ------------------------------
    flags, sels, wranks = [], [], []
    remaining = occ
    for bi, (t_cap, s_cap, bmax) in enumerate(buckets):
        if bi == len(buckets) - 1:
            fl = remaining
        else:
            fl = remaining & (cnt_t <= t_cap) & (maxrun <= s_cap)
        flf = fl.reshape(-1)
        wrank = jnp.cumsum(flf.astype(i32)) - 1
        sel = flf & (wrank < bmax)
        # spill over-budget windows to the next bucket; only the last
        # bucket's budget drops (see _packed_bucketed_blocks)
        remaining = remaining & ~sel.reshape(cnt_t.shape)
        flags.append(flf)
        wranks.append(wrank)
        sels.append(sel)

    # ---- per-body window mapping (sorted order) ----------------------------
    p_r = jnp.arange(n, dtype=i32)
    col_s = cid_sorted // g  # n_cols_loc for parked rows
    w_own_b = jnp.minimum(cid_sorted - col_s * g, g - 1) // b
    if two_d:
        cxl = col_s // gy
        cyl = col_s - cxl * gy
        owned = (
            (cxl >= 1) & (cxl < w_x + 1) & (cyl >= 1) & (cyl < w_y + 1)
        )
        col_rel = jnp.clip((cxl - 1) * w_y + (cyl - 1), 0, n_cols_own - 1)
    else:
        owned = (col_s >= gy) & (col_s < gy + n_cols_own)
        col_rel = jnp.clip(col_s - gy, 0, n_cols_own - 1)
    rank_t = p_r - ts_tab[col_rel, w_own_b]
    f_own = col_rel * n_bands + w_own_b
    rank_w = p_r - starts[jnp.minimum(col_s * g + w_own_b * b, g3)]

    # symmetric-drop mask: owned rows by their bucket; halo rows by the
    # LAST bucket's rows (see docstring)
    ok_sorted = jnp.zeros((n,), bool)
    for sel, (t_cap, _, _) in zip(sels, buckets):
        t_rows = _round_up(max(t_cap, 8), 8)
        ok_sorted = ok_sorted | (
            owned & sel[f_own] & (rank_t < t_rows)
        )
    t_last = _round_up(max(buckets[-1][0], 8), 8)
    ok_sorted = ok_sorted | (
        ~owned & (col_s < n_cols_loc) & (rank_w < t_last)
    )
    t_ok = jnp.concatenate([ok_sorted, jnp.zeros((1,), bool)])

    out_d = jnp.zeros((n, 8), f32)
    out_e = jnp.full((n, 8), DEPTH_SENTINEL, f32)
    out_g = None if short_gravity is None else jnp.zeros((n, 8), f32)
    n_overflow = jnp.int32(0)
    cnt_flat = cnt_t.reshape(-1)
    for bi, ((t_cap, s_cap, bmax), flf, sel, wrank) in enumerate(
        zip(buckets, flags, sels, wranks)
    ):
        t_rows = _round_up(max(t_cap, 8), 8)
        s_capw = max(s_cap, 8)
        s_rows = _round_up(9 * s_capw, LANE)
        # only the LAST bucket's block budget drops (earlier buckets spill)
        if bi == len(buckets) - 1:
            n_overflow += jnp.sum(jnp.where(flf & ~sel, cnt_flat, 0))
        wsel, wvalid = take_rows(sel, bmax)
        ocr = wsel // n_bands  # own-column rank
        w_sel = wsel - ocr * n_bands
        ts_sel = ts_tab[ocr, w_sel]
        cnt_sel = jnp.where(wvalid, cnt_t[ocr, w_sel], 0)
        n_overflow += jnp.sum(jnp.maximum(cnt_sel - t_rows, 0))
        # source overflow counted on each window's OWN strip only
        # (neighbor index 4 = the (0, 0) offset of the (-1,0,1)^2
        # enumeration): every window is owned by exactly one chip, so
        # per-chip psums add up to a whole-grid count without double
        # counting shared strips or halo copies — the same accounting
        # rule as packed_collision_blocks_local's own-column count
        # (unlike the compacted/global-bucketed per-neighborhood superset)
        own_run = jnp.where(wvalid, run9[ocr, 4, w_sel], 0)
        n_overflow += jnp.sum(jnp.maximum(own_run - s_capw, 0))

        ar_t = jnp.arange(t_rows, dtype=i32)
        valid_t = ar_t[None, :] < jnp.minimum(cnt_sel, t_rows)[:, None]
        take_t = jnp.minimum(ts_sel[:, None] + ar_t, n)
        tgt = feats_sorted[jnp.where(valid_t, take_t, n)].reshape(-1, 16)

        neigh_sel = neigh_own[ocr]  # [bmax, 9] local column ids
        ar_s = jnp.arange(s_capw, dtype=i32)
        # same occupancy guard as the global bucketed layout: a whole-grid
        # (here whole-slab) strips table for a bucket serving few windows
        # is a memory explosion on peaked scenes at fine grids
        if bi == 0 and 4 * bmax >= n_cols_loc * n_bands:
            # strips table over ALL local columns at this bucket's cap,
            # built per the same measured construction rule as the
            # global bucketed layout (_packed_bucketed_blocks: slice =
            # contiguous dynamic_slice off the t_ok-masked transposed
            # operand, 1.34x at 262k strips-table sizes; grid-gather
            # wins below ~6e5 table rows)
            valid_so = (
                ar_s[None, None, :]
                < jnp.minimum(runs_all, s_capw)[..., None]
            )
            use_slice = construction == "slice" or (
                construction == "auto"
                and n_cols_loc * n_bands * s_capw >= 600_000
            )
            if use_slice:
                dead = feats[n]
                op = jnp.concatenate(
                    [jnp.where(t_ok[:n, None], feats_sorted[:n], dead),
                     jnp.broadcast_to(dead[None], (s_capw + 1, 16))], 0)
                opT = op.T
                stripsT = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(
                        opT, (0, s), (16, s_capw))
                )(ss_tab.reshape(-1)).reshape(
                    n_cols_loc, n_bands, 16, s_capw)
                stripsT = jnp.where(
                    valid_so[:, :, None, :], stripsT, dead[:, None])
            else:
                take_so = jnp.minimum(ss_tab[..., None] + ar_s, n)
                strips = feats_sorted[
                    jnp.where(valid_so & t_ok[take_so], take_so, n)
                ]  # [n_cols_loc, n_bands, s_capw, 16]
                stripsT = strips.transpose(0, 1, 3, 2)
            dead_strip = jnp.broadcast_to(
                feats[n][:, None], (1, n_bands, 16, s_capw)
            )
            stripsT = jnp.concatenate([stripsT, dead_strip], axis=0)
            loc = jnp.where(neigh_sel < n_cols_loc, neigh_sel, n_cols_loc)
            fused = stripsT[loc, w_sel[:, None]]  # [bmax, 9, 16, s_capw]
            src = fused.transpose(0, 2, 1, 3).reshape(
                bmax, 16, 9 * s_capw
            )
        else:
            okn = neigh_sel < n_cols_loc
            ss = starts[jnp.where(
                okn, neigh_sel * g + lo_cell[w_sel][:, None], g3
            )]
            se = starts[jnp.where(
                okn, neigh_sel * g + hi_cell[w_sel][:, None], g3
            )]
            valid_s = (
                ar_s[None, None, :]
                < jnp.minimum(se - ss, s_capw)[..., None]
            ) & wvalid[:, None, None]
            take_s = jnp.minimum(ss[..., None] + ar_s, n)
            rows_g = feats_sorted[
                jnp.where(valid_s & t_ok[take_s], take_s, n)
            ]  # [bmax, 9, s_capw, 16]
            src = rows_g.transpose(0, 3, 1, 2).reshape(
                bmax, 16, 9 * s_capw
            )
        lane_pad = jnp.broadcast_to(
            feats[n][:, None], (bmax, 16, s_rows - 9 * s_capw)
        )
        src = jnp.concatenate([src, lane_pad], axis=2).reshape(-1, s_rows)

        kern, g_specs, g_shapes, par_w = _grav_pallas_extras(
            short_gravity, t_rows, s_rows, bmax
        )
        outs = pl.pallas_call(
            kern,
            grid=(bmax,),
            in_specs=[
                pl.BlockSpec((1, par_w), lambda c: (0, 0),
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
            ] + g_specs,
            out_shape=[
                jax.ShapeDtypeStruct((bmax * t_rows, 8), f32),
                jax.ShapeDtypeStruct((bmax * t_rows, 8), f32),
            ] + g_shapes,
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
            interpret=interpret,
        )(par, tgt, src)
        delta, evt = outs[0], outs[1]

        delta_p = jnp.concatenate([delta, jnp.zeros((1, 8), f32)], axis=0)
        evt_p = jnp.concatenate(
            [evt, jnp.full((1, 8), DEPTH_SENTINEL, f32)], axis=0
        )
        slot_sorted = jnp.where(
            owned & sel[f_own] & (rank_t < t_rows),
            wrank[f_own] * t_rows + rank_t,
            bmax * t_rows,
        )
        body_slot = slot_sorted[inv]
        out_d = out_d + delta_p[body_slot]
        e_k = evt_p[body_slot]
        out_e = jnp.where((e_k[:, 0] > out_e[:, 0])[:, None], e_k, out_e)
        if short_gravity is not None:
            grav_p = jnp.concatenate(
                [outs[2], jnp.zeros((1, 8), f32)], axis=0
            )
            out_g = out_g + grav_p[body_slot]

    if short_gravity is not None:
        return out_d, out_e, out_g, n_overflow
    return out_d, out_e, n_overflow
