"""Spatially-owned sharded granular physics: halo exchange, O(N/D) memory.

make_sharded_granular_step (nbx.parallel.shard) scales the full-physics
collisional step's PAIR WORK to O(N S / D) per chip, but it still
all-gathers the body state: per-chip MEMORY is O(N), which caps the
multi-chip path at the single-chip capacity ceiling (~16M bodies of HBM)
no matter how many chips join the mesh. This module removes that ceiling —
the distributed-memory design ROADMAP 4c names as the remaining step:

  * OWNERSHIP IS SPATIAL: the collision grid's g x-cell layers split into
    D contiguous slabs of W = g/D layers; chip d owns the bodies inside
    slab d, in a fixed-capacity [nl] slot array (dead slots mass 0). A
    persistent per-body `uid` carries identity across chips — contact
    timers key on partner uid, not slot index (slot indices change on
    every migration).
  * MIGRATION, not all-gather: after the drift, bodies that left the slab
    ship to the +-1 x-neighbor chip through fixed-cap ppermute buffers
    (mig_cap rows/side) and land in dead slots. Bodies headed further than
    one slab hop one slab per step (counted as in_transit; they skip
    collisions while between slabs — at sane dt a body crosses a CELL in
    many steps, so transit is a pathology counter, not a running mode).
    Bodies past mig_cap simply WAIT a step (counted, never lost); bodies
    that find no dead slot on arrival are dropped and counted (size nl
    with headroom — the no-silent-caps rule).
  * HALO EXCHANGE, not replication: collisions reach +-1 cell, so each
    chip sends only its boundary x-cell LAYER (halo_cap rows/side) to each
    x-neighbor. The packed collision kernel then runs on a LOCAL
    [W + 2, g, g] slab grid (nbx.ops.collide.packed_collision_blocks_local)
    over [nl + 2 halo] rows: owned columns are targets, halo columns are
    source-only. Comm per step is O(halo) + O(pm_grid^3), independent of N.
  * EVENT MACHINERY cross-chip by symmetry: the pair quantities the gates
    need (vn, q, E) are bitwise-symmetric between the two owners, so each
    owner evaluates the same gates locally. Three small aligned exchanges
    complete the protocol: (1) halo body features before the kernel;
    (2) the halo bodies' post-kernel partner uid / contact timer /
    post-delta state (mutual-partner check + merge/fracture payload);
    (3) fracture-accept kill flags back to the secondary parent's owner
    (the primary's f_cap extraction decides acceptance, and the secondary
    must not kill its parent for a dropped event).
  * Merge keeps the LOWER-UID slot (the at-scale analog of the
    reference's lower-index in-place merge, index.html:392-409, same
    divergence class as nbx.collisions_scaled's in-place merge note);
    fractures sample fragments with a per-chip folded key and place them
    in the primary owner's dead slots.
  * Gravity: "pm" deposits local bodies on the pm_grid^3 CIC grid, psums
    the DENSITY grid over the mesh (N-independent comm), and every chip
    runs the replicated FFT solve (nbx.ops.pm.pm_solve_grid) and gathers
    its own rows; "zero" isolates contact dynamics. Direct-sum gravity
    wants the all-gather design — use make_sharded_granular_step there
    (it pays O(N) memory anyway).

Divergences from the single-chip collisions_scaled path (all counted or
tested): fragment RNG streams are per-chip (fold_in(key, chip)) and the
fracture cap is per chip, not global; partner tie-breaks on bitwise-equal
depths use local slot ids, so a cross-boundary tie can fail the mutual
gate (bounce-only) where a single-chip run fires an event; under
target-cap window overflow the dropped SET at a slab boundary is decided
by each chip's local sort order. Zero-overflow caps (packed_caps_for) and
tie-free scenes give step-for-step parity with granular_full_kdk_scan —
gated by tests/test_spatial.py on the virtual 8-device mesh.

Physics semantics: reference resolveCollisions / mergeBodies /
fractureBody (/root/reference/index.html:293-443), as implemented at
scale by nbx.collisions_scaled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbx import thermal
from nbx.collisions import _make_fragments
from nbx.config import SimConfig, body_radius
from nbx.ops.collide import epilogue_rows, packed_collision_blocks_local
from nbx.ops.p3m import take_rows


class SpatialState(NamedTuple):
    """Slot arrays [D * nl], body axis sharded P("b"); chip d's rows hold
    ONLY bodies inside x-slab d (or dead slots / in-transit migrants).
    uid_next is a replicated scalar: the next fresh uid for fragments."""

    pos: jax.Array  # [N, 3] f32
    vel: jax.Array  # [N, 3] f32
    acc: jax.Array  # [N, 3] f32 (carried KDK acceleration)
    mass: jax.Array  # [N] f32 (0 = dead slot)
    mat: jax.Array  # [N] i32
    temp: jax.Array  # [N] f32
    uid: jax.Array  # [N] i32 persistent identity (-1 = dead slot)
    partner_uid: jax.Array  # [N] i32 deepest-partner uid (-1 = none)
    contact_t: jax.Array  # [N] f32
    uid_next: jax.Array  # [] i32 (replicated)


def spatial_state_for(
    mesh: Mesh,
    pos,
    vel,
    mass,
    box_size: float,
    n_cells: int,
    mat=None,
    temp=None,
    nl: int | None = None,
    slack: float = 1.5,
) -> SpatialState:
    """Distribute a global scene into slab-owned slot arrays (host-side).

    nl (slots per chip) defaults to the most-loaded slab's count times
    `slack`, rounded up to 8 — the headroom is what absorbs migration and
    fragment births before drops start being counted. Dead input rows
    (mass <= 0) are dropped: a uid names a body that EXISTS, and dead
    slots are this layout's own free-list, not payload."""
    import numpy as np

    d = mesh.devices.size
    g = n_cells
    if g % d:
        raise ValueError(f"n_cells={g} must divide over {d} devices")
    w = g // d
    pos = np.asarray(pos, np.float32)
    vel = np.asarray(vel, np.float32)
    mass = np.asarray(mass, np.float32)
    n = pos.shape[0]
    mat = np.zeros(n, np.int32) if mat is None else np.asarray(mat, np.int32)
    temp = (np.zeros(n, np.float32) if temp is None
            else np.asarray(temp, np.float32))
    keep = mass > 0.0
    uid0 = np.nonzero(keep)[0].astype(np.int32)
    pos, vel, mass = pos[keep], vel[keep], mass[keep]
    mat, temp = mat[keep], temp[keep]
    cell = box_size / g
    cx = np.clip((pos[:, 0] / cell).astype(np.int64), 0, g - 1)
    dest = np.clip(cx // w, 0, d - 1)
    counts = np.bincount(dest, minlength=d)
    if nl is None:
        nl = max(8, int(np.ceil(counts.max() * slack / 8)) * 8)
    if counts.max() > nl:
        raise ValueError(
            f"slab {counts.argmax()} holds {counts.max()} bodies > nl={nl}"
        )

    def alloc(shape, fill, dtype):
        return np.full((d * nl, *shape), fill, dtype)

    P3 = alloc((3,), 0.0, np.float32)
    V3 = alloc((3,), 0.0, np.float32)
    M = alloc((), 0.0, np.float32)
    MT = alloc((), 0, np.int32)
    T = alloc((), 0.0, np.float32)
    U = alloc((), -1, np.int32)
    for c in range(d):
        rows = np.nonzero(dest == c)[0]
        sl = slice(c * nl, c * nl + rows.size)
        P3[sl] = pos[rows]
        V3[sl] = vel[rows]
        M[sl] = mass[rows]
        MT[sl] = mat[rows]
        T[sl] = temp[rows]
        U[sl] = uid0[rows]
    s3 = NamedSharding(mesh, P("b", None))
    s1 = NamedSharding(mesh, P("b"))
    sr = NamedSharding(mesh, P())
    put = jax.device_put
    return SpatialState(
        pos=put(jnp.asarray(P3), s3),
        vel=put(jnp.asarray(V3), s3),
        acc=put(jnp.zeros((d * nl, 3), jnp.float32), s3),
        mass=put(jnp.asarray(M), s1),
        mat=put(jnp.asarray(MT), s1),
        temp=put(jnp.asarray(T), s1),
        uid=put(jnp.asarray(U), s1),
        partner_uid=put(jnp.full((d * nl,), -1, jnp.int32), s1),
        contact_t=put(jnp.zeros((d * nl,), jnp.float32), s1),
        uid_next=put(jnp.asarray(n, jnp.int32), sr),
    )


def make_spatial_granular_step(
    mesh: Mesh,
    cfg: SimConfig,
    box_size: float,
    n_cells: int,
    band_cells: int,
    packed_caps: tuple[int, int],
    halo_cap: int,
    mig_cap: int,
    force_impl: str = "pm",
    pm_grid: int = 128,
    interpret: bool = False,
):
    """Build the halo-exchange sharded granular step (module docstring).

    Returns jitted (state: SpatialState, h, key) -> (state, counters);
    counters = the collisions_scaled scalar set (n_bounces/n_merges/
    n_fractures/n_overflow/n_dropped/cell_too_small) plus the spatial
    protocol's own: n_mig_wait (movers past mig_cap, delayed one step),
    n_halo_over (boundary bodies past halo_cap — potentially missed
    cross-boundary contacts), in_transit (bodies between slabs this
    step). key must be fresh per step (fold_in) and identical across
    chips; fragment streams fold the chip index on top.
    """
    n_dev = mesh.devices.size
    g = n_cells
    if g % n_dev:
        raise ValueError(f"n_cells={g} must divide over {n_dev} devices")
    w_x = g // n_dev
    if force_impl not in ("pm", "zero"):
        raise ValueError(
            "spatial step supports force_impl 'pm' | 'zero' (direct-sum "
            "gravity needs the all-gather design: make_sharded_granular_step)"
        )
    if force_impl == "pm":
        from nbx.ops.pm import cic_deposit, cic_gather, pm_solve_grid

    mats = cfg.materials
    f_cap = cfg.max_fractures
    cell = box_size / g
    i32 = jnp.int32
    H = halo_cap
    M = mig_cap
    perm_r = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_l = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def _send(rows_f, rows_i, idx, valid, perm):
        """Gather payload rows at idx (invalid -> zeros/-1) and ppermute."""
        pf = jnp.where(valid[:, None], rows_f[idx], 0.0)
        pi = jnp.where(valid[:, None], rows_i[idx], -1)
        return (
            jax.lax.ppermute(pf, "b", perm),
            jax.lax.ppermute(pi, "b", perm),
        )

    @jax.jit
    def step(state: SpatialState, h, key):
        def local(pos, vel, acc, mass, mat, temp, uid, p_uid, ct, uid_next):
            nl = pos.shape[0]
            me = jax.lax.axis_index("b").astype(i32)
            rows = jnp.arange(nl, dtype=i32)

            # ---- KDK first half ------------------------------------------
            vel = vel + acc * (0.5 * h)
            pos = pos + vel * h

            # ---- migration (one slab hop per step) -----------------------
            alive = mass > 0.0
            cx = jnp.clip((pos[:, 0] / cell).astype(i32), 0, g - 1)
            dest = jnp.clip(cx // w_x, 0, n_dev - 1)
            go_r = alive & (dest > me)
            go_l = alive & (dest < me)
            idx_r, v_r = take_rows(go_r, M)
            idx_l, v_l = take_rows(go_l, M)
            n_mig_wait = jax.lax.psum(
                jnp.sum(go_r.astype(i32)) - jnp.sum(v_r.astype(i32))
                + jnp.sum(go_l.astype(i32)) - jnp.sum(v_l.astype(i32)),
                "b",
            )
            mig_f = jnp.concatenate(
                [pos, vel, mass[:, None], temp[:, None], ct[:, None]], axis=1
            )  # [nl, 9]
            mig_i = jnp.stack([mat, uid, p_uid], axis=1)  # [nl, 3]
            rf_l, ri_l = _send(mig_f, mig_i, idx_r, v_r, perm_r)  # from left
            rf_r, ri_r = _send(mig_f, mig_i, idx_l, v_l, perm_l)  # from right
            # kill the sent rows
            sent = jnp.zeros((nl,), bool)
            sent = sent.at[jnp.where(v_r, idx_r, nl)].set(True, mode="drop")
            sent = sent.at[jnp.where(v_l, idx_l, nl)].set(True, mode="drop")
            mass = jnp.where(sent, 0.0, mass)
            uid = jnp.where(sent, -1, uid)
            # place arrivals into dead slots (rank-scatter)
            arr_f = jnp.concatenate([rf_l, rf_r], axis=0)  # [2M, 9]
            arr_i = jnp.concatenate([ri_l, ri_r], axis=0)  # [2M, 3]
            ok = (arr_i[:, 1] >= 0) & (arr_f[:, 6] > 0.0)
            dead = mass <= 0.0
            drank = jnp.cumsum(dead.astype(i32)) - 1
            slot_of = jnp.full((2 * M,), nl, i32).at[
                jnp.where(dead & (drank < 2 * M), drank, 2 * M)
            ].set(rows, mode="drop")
            rrank = jnp.cumsum(ok.astype(i32)) - 1
            slot = jnp.where(ok, slot_of[jnp.clip(rrank, 0, 2 * M - 1)], nl)
            placed = ok & (slot < nl)
            slot = jnp.where(placed, slot, nl)
            n_mig_drop = jax.lax.psum(
                jnp.sum(ok.astype(i32)) - jnp.sum(placed.astype(i32)), "b"
            )
            pos = pos.at[slot].set(arr_f[:, 0:3], mode="drop")
            vel = vel.at[slot].set(arr_f[:, 3:6], mode="drop")
            mass = mass.at[slot].set(arr_f[:, 6], mode="drop")
            temp = temp.at[slot].set(arr_f[:, 7], mode="drop")
            ct = ct.at[slot].set(arr_f[:, 8], mode="drop")
            mat = mat.at[slot].set(arr_i[:, 0], mode="drop")
            uid = uid.at[slot].set(arr_i[:, 1], mode="drop")
            p_uid = p_uid.at[slot].set(arr_i[:, 2], mode="drop")

            # ---- halo exchange 1: boundary x-cell layers -----------------
            alive = mass > 0.0
            cx = jnp.clip((pos[:, 0] / cell).astype(i32), 0, g - 1)
            in_transit = alive & (jnp.clip(cx // w_x, 0, n_dev - 1) != me)
            n_transit = jax.lax.psum(jnp.sum(in_transit.astype(i32)), "b")
            lay_l = alive & ~in_transit & (cx == me * w_x)
            lay_r = alive & ~in_transit & (cx == (me + 1) * w_x - 1)
            idxh_l, vh_l = take_rows(lay_l, H)
            idxh_r, vh_r = take_rows(lay_r, H)
            n_halo_over = jax.lax.psum(
                jnp.sum(lay_l.astype(i32)) - jnp.sum(vh_l.astype(i32))
                + jnp.sum(lay_r.astype(i32)) - jnp.sum(vh_r.astype(i32)),
                "b",
            )
            hal_f = jnp.concatenate(
                [pos, vel, mass[:, None]], axis=1
            )  # [nl, 7]
            hal_i = jnp.stack([mat, uid], axis=1)  # [nl, 2]
            # my RIGHT layer -> right neighbor = its LEFT halo; and so on
            hf_L, hi_L = _send(hal_f, hal_i, idxh_r, vh_r, perm_r)
            hf_R, hi_R = _send(hal_f, hal_i, idxh_l, vh_l, perm_l)
            pos_h = jnp.concatenate([hf_L[:, 0:3], hf_R[:, 0:3]], axis=0)
            vel_h = jnp.concatenate([hf_L[:, 3:6], hf_R[:, 3:6]], axis=0)
            mass_h = jnp.concatenate([hf_L[:, 6], hf_R[:, 6]], axis=0)
            mat_h = jnp.concatenate([hi_L[:, 0], hi_R[:, 0]], axis=0)
            uid_h = jnp.concatenate([hi_L[:, 1], hi_R[:, 1]], axis=0)

            # ---- gravity on the post-migration shard ---------------------
            if force_impl == "zero":
                acc_new = jnp.zeros_like(pos)
            else:
                rho = jax.lax.psum(
                    cic_deposit(pos, mass, box_size, pm_grid,
                                periodic=False),
                    "b",
                )
                acc_grid = pm_solve_grid(rho, cfg.G, box_size, pm_grid,
                                         isolated=True)
                acc_new = cic_gather(acc_grid, pos, box_size, pm_grid,
                                     periodic=False)

            # ---- packed collision kernel on the local slab grid ----------
            pos_a = jnp.concatenate([pos, pos_h], axis=0)
            vel_a = jnp.concatenate([vel, vel_h], axis=0)
            mass_a = jnp.concatenate([mass, mass_h], axis=0)
            mat_a = jnp.concatenate([mat, mat_h], axis=0)
            uid_a = jnp.concatenate([uid, uid_h], axis=0)
            rad_a = body_radius(mass_a, mat_a, mats)
            n_all = nl + 2 * H
            delta, evt, body_slot, novf = packed_collision_blocks_local(
                pos_a, vel_a, mass_a, rad_a, box_size, g, band_cells,
                packed_caps, cfg.restitution, cfg.friction,
                me * w_x - 1, w_x, interpret,
            )
            out_d, out_e = epilogue_rows(delta, evt, body_slot)
            n_overflow = jax.lax.psum(novf, "b")
            n_bounces = (
                jax.lax.psum(jnp.sum(out_d[:nl, 7]), "b") / 2.0
            ).astype(i32)
            too_small = (
                2.0 * jax.lax.pmax(jnp.max(rad_a), "b") > cell
            )
            od, oe = out_d[:nl], out_e[:nl]

            # winner's pair quantities from the PRE-delta local state
            # (same formulas as _collide_epilogue; j is a LOCAL row)
            has = oe[:, 0] > 0.0
            j_loc = jnp.where(has, oe[:, 1].astype(i32), n_all - 1)
            jcl = jnp.clip(j_loc, 0, n_all - 1)
            dd = pos_a[jcl] - pos
            r2b = jnp.sum(dd * dd, axis=-1)
            invb = jax.lax.rsqrt(jnp.where(r2b > 0.0, r2b, 1.0))
            vnb = jnp.sum((vel_a[jcl] - vel) * dd, axis=-1) * invb
            m_j = mass_a[jcl]
            m_sum = mass + m_j
            r_msb = 1.0 / jnp.where(m_sum > 0.0, m_sum, 1.0)
            e_b = 0.5 * (mass * m_j * r_msb) * vnb * vnb
            q_l = jnp.where(has, e_b * r_msb, 0.0)
            appr_l = has & (vnb < 0.0)

            # apply the sweep's Jacobi deltas to the OWNED rows
            pos = pos + od[:, 3:6]
            vel = vel + od[:, 0:3]
            temp = temp + od[:, 6]

            # ---- contact timers on partner UID (L314-319) ----------------
            pu_new = jnp.where(has, uid_a[jcl], -1)
            same = has & (pu_new == p_uid) & (pu_new >= 0)
            ct = jnp.where(has, jnp.where(same, ct + h, h), 0.0)

            # ---- exchange 2: halo decision fields + post-delta state -----
            dec_f = jnp.concatenate(
                [pos, vel, temp[:, None], ct[:, None]], axis=1
            )  # [nl, 8] (post-delta)
            dec_i = pu_new[:, None]  # [nl, 1]
            df_L, di_L = _send(dec_f, dec_i, idxh_r, vh_r, perm_r)
            df_R, di_R = _send(dec_f, dec_i, idxh_l, vh_l, perm_l)
            pos2_h = jnp.concatenate([df_L[:, 0:3], df_R[:, 0:3]], axis=0)
            vel2_h = jnp.concatenate([df_L[:, 3:6], df_R[:, 3:6]], axis=0)
            temp2_h = jnp.concatenate([df_L[:, 6], df_R[:, 6]], axis=0)
            ct_h = jnp.concatenate([df_L[:, 7], df_R[:, 7]], axis=0)
            pu_h = jnp.concatenate([di_L[:, 0], di_R[:, 0]], axis=0)
            pos2_a = jnp.concatenate([pos, pos2_h], axis=0)
            vel2_a = jnp.concatenate([vel, vel2_h], axis=0)
            temp2_a = jnp.concatenate([temp, temp2_h], axis=0)
            ct_a = jnp.concatenate([ct, ct_h], axis=0)
            pu_a = jnp.concatenate([pu_new, pu_h], axis=0)

            # ---- event gates on mutual partners (L340-359) ---------------
            mutual = has & (uid >= 0) & (pu_a[jcl] == uid)
            t_pair = jnp.minimum(ct, ct_a[jcl])
            merge_m = (
                mutual & appr_l
                & (t_pair > cfg.merge_time)
                & (q_l < cfg.fracture_threshold * 2.0)
            )
            fract_m = (
                mutual & appr_l & ~merge_m
                & (q_l > cfg.fracture_threshold)
                & ((mass > cfg.min_fragment_mass)
                   | (m_j > cfg.min_fragment_mass))
            )
            lower = uid < pu_new
            prim_m = merge_m & lower
            kill_m = merge_m & ~lower
            prim_f = fract_m & lower

            # ---- merges in place into the lower-UID slot (L392-409) ------
            tot = mass + m_j
            safe_tot = jnp.where(tot > 0, tot, 1.0)
            mpos = (pos * mass[:, None] + pos2_a[jcl] * m_j[:, None]) \
                / safe_tot[:, None]
            mvel = (vel * mass[:, None] + vel2_a[jcl] * m_j[:, None]) \
                / safe_tot[:, None]
            mtemp = (temp * mass + temp2_a[jcl] * m_j) / safe_tot
            mmat = jnp.where(mass > m_j, mat, mat_a[jcl])  # heavier (L403)

            # fracture payload BEFORE the merge/kill writes
            f_safe = jnp.where(fract_m, tot, 1.0)
            f_com = (pos * mass[:, None] + pos2_a[jcl] * m_j[:, None]) \
                / f_safe[:, None]
            f_bvel = (vel * mass[:, None] + vel2_a[jcl] * m_j[:, None]) \
                / f_safe[:, None]
            e_best = jnp.where(fract_m, e_b, 0.0)
            f_temp = jnp.maximum(temp, temp2_a[jcl]) + (e_best / f_safe) * 0.1
            f_mat = jnp.where(mass > m_j, mat, mat_a[jcl])
            f_rsum = rad_a[:nl] + rad_a[jcl]

            pm2 = prim_m[:, None]
            pos = jnp.where(pm2, mpos, pos)
            vel = jnp.where(pm2, mvel, jnp.where(kill_m[:, None], 0.0, vel))
            temp = jnp.where(prim_m, mtemp, jnp.where(kill_m, 0.0, temp))
            mat = jnp.where(prim_m, mmat, mat)
            mass = jnp.where(prim_m, tot, jnp.where(kill_m, 0.0, mass))
            uid = jnp.where(kill_m, -1, uid)

            # ---- fractures: per-chip extraction + fragment sampling ------
            fi, f_valid = take_rows(prim_f, f_cap)
            frag = _make_fragments(
                jax.random.fold_in(key, me), cfg, f_valid,
                f_com[fi], f_bvel[fi],
                jnp.where(f_valid, e_best[fi], 0.0),
                tot[fi], f_temp[fi], f_mat[fi], f_rsum[fi],
            )
            # kill accepted parents: my fi rows, plus partners — local
            # directly, remote via exchange 3 kill flags
            fkill = jnp.zeros((nl,), bool)
            fkill = fkill.at[jnp.where(f_valid, fi, nl)].set(
                True, mode="drop"
            )
            fj = jnp.where(f_valid, jcl[fi], n_all)
            fkill = fkill.at[jnp.where(fj < nl, fj, nl)].set(
                True, mode="drop"
            )
            flag_h = jnp.zeros((2 * H,), bool).at[
                jnp.where(fj >= nl, fj - nl, 2 * H)
            ].set(True, mode="drop")
            # flags for my LEFT halo rows go back to the left owner (who
            # sent them via perm_r) and vice versa
            back_l = jax.lax.ppermute(flag_h[:H], "b", perm_l)
            back_r = jax.lax.ppermute(flag_h[H:], "b", perm_r)
            # back_l arrives aligned with MY idxh_r rows; back_r with idxh_l
            fkill = fkill.at[
                jnp.where(vh_r & back_l, idxh_r, nl)
            ].set(True, mode="drop")
            fkill = fkill.at[
                jnp.where(vh_l & back_r, idxh_l, nl)
            ].set(True, mode="drop")
            mass = jnp.where(fkill, 0.0, mass)
            vel = jnp.where(fkill[:, None], 0.0, vel)
            temp = jnp.where(fkill, 0.0, temp)
            uid = jnp.where(fkill, -1, uid)

            # ---- fragment placement into dead slots ----------------------
            n_fk = frag["mask"].shape[0]  # F * K
            dead = mass <= 0.0
            drank = jnp.cumsum(dead.astype(i32)) - 1
            slot_of2 = jnp.full((n_fk,), nl, i32).at[
                jnp.where(dead & (drank < n_fk), drank, n_fk)
            ].set(rows, mode="drop")
            frank = jnp.cumsum(frag["mask"].astype(i32)) - 1
            fslot = jnp.where(
                frag["mask"], slot_of2[jnp.clip(frank, 0, n_fk - 1)], nl
            )
            fplaced = frag["mask"] & (fslot < nl)
            fslot = jnp.where(fplaced, fslot, nl)
            mass = mass.at[fslot].set(frag["mass"], mode="drop")
            pos = pos.at[fslot].set(frag["pos"], mode="drop")
            vel = vel.at[fslot].set(frag["vel"], mode="drop")
            temp = temp.at[fslot].set(frag["temp"], mode="drop")
            mat = mat.at[fslot].set(frag["mat"], mode="drop")
            new_uid = uid_next + me * n_fk + jnp.arange(n_fk, dtype=i32)
            uid = uid.at[fslot].set(new_uid, mode="drop")
            uid_next2 = uid_next + i32(n_dev * n_fk)

            # ---- reset contact bookkeeping on touched slots --------------
            touched = prim_m | kill_m | fkill
            touched = touched.at[fslot].set(True, mode="drop")
            pu_new = jnp.where(touched, -1, pu_new)
            ct = jnp.where(touched, 0.0, ct)
            # reborn slots are NEWBORN: acc = 0 (index.html:217)
            acc_new = jnp.where(touched[:, None], 0.0, acc_new)

            # ---- second half-kick + thermal decay ------------------------
            vel = vel + acc_new * (0.5 * h)
            temp = thermal.decay(temp, cfg.heat_decay)

            # ---- counters ------------------------------------------------
            n_merges = jax.lax.psum(jnp.sum(prim_m.astype(i32)), "b")
            n_fracts = jax.lax.psum(jnp.sum(prim_f.astype(i32)), "b")
            n_dropped = jax.lax.psum(
                jnp.sum(prim_f.astype(i32)) - jnp.sum(f_valid.astype(i32))
                + jnp.sum(frag["mask"].astype(i32))
                - jnp.sum(fplaced.astype(i32)),
                "b",
            ) + n_mig_drop
            return (pos, vel, acc_new, mass, mat, temp, uid, pu_new, ct,
                    uid_next2, n_merges, n_fracts, n_bounces, n_overflow,
                    n_dropped, too_small, n_mig_wait, n_halo_over, n_transit)

        out = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P("b", None), P("b", None), P("b", None), P("b"), P("b"),
                P("b"), P("b"), P("b"), P("b"), P(),
            ),
            out_specs=(
                P("b", None), P("b", None), P("b", None), P("b"), P("b"),
                P("b"), P("b"), P("b"), P("b"), P(),
                P(), P(), P(), P(), P(), P(), P(), P(), P(),
            ),
            # pallas_call's out_shape carries no vma annotation (see
            # make_sharded_binned_collision_pass)
            check_vma=False,
        )(state.pos, state.vel, state.acc, state.mass, state.mat,
          state.temp, state.uid, state.partner_uid, state.contact_t,
          state.uid_next)
        new_state = SpatialState(*out[:10])
        return new_state, {
            "n_merges": out[10], "n_fractures": out[11],
            "n_bounces": out[12], "n_overflow": out[13],
            "n_dropped": out[14], "cell_too_small": out[15],
            "n_mig_wait": out[16], "n_halo_over": out[17],
            "in_transit": out[18],
        }

    return step
