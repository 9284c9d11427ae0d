"""Pallas P3M short-range (PP) kernel: parity vs the XLA path.

The kernel must be a drop-in for nbx.ops.p3m.short_range_acc: same kept
set (first max_per_cell bodies per cell in cell-sorted order), same
n_overflow, same pair mask — so p3m_acceleration's adaptive-residual
bookkeeping is implementation-independent. Differences are fp-only (the
A&S 7.1.26 erfc polynomial, abs err <= 1.5e-7, and reduction order).
"""

import jax.numpy as jnp
import numpy as np

from nbx.ops.p3m import cell_bin_full, p3m_acceleration, short_range_acc
from nbx.ops.ppkernel import short_range_acc_pallas


def _scene(n=700, seed=3, lo=1.0, hi=24.0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    return pos, mass


def test_pp_pallas_matches_xla():
    """Same scene, same (g, K): accelerations match the XLA 27-offset path
    to fp tolerance and overflow counts are identical."""
    pos, mass = _scene()
    box, g, k = 50.0, 6, 12
    G, a, eps = 0.7, (box / g) / 3.0, 0.05
    table, _, novf, _ = cell_bin_full(pos, box, g, k)
    acc_x, novf_x = short_range_acc(
        pos, mass, G, a, box, g, k, eps, table=table, n_overflow=novf
    )
    acc_p, novf_p = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True
    )
    assert int(novf_p) == int(novf_x) > 0  # overflowing scene on purpose
    ax, ap = np.asarray(acc_x), np.asarray(acc_p)
    scale = np.abs(ax).max()
    np.testing.assert_allclose(ap, ax, rtol=2e-5, atol=3e-6 * scale)


def test_pp_pallas_bucketed_matches_uniform():
    """Occupancy-bucketed cells (buckets=...): identical pair set to the
    uniform layout — accelerations match to fp tolerance, no drops on
    correctly-sized budgets, and a clustered scene actually splits across
    buckets (bulk caps < K)."""
    from nbx.ops.ppkernel import pp_buckets_for

    rng = np.random.default_rng(7)
    field = rng.uniform(1.0, 49.0, (600, 3))
    core = np.clip(rng.normal(25.0, 1.5, (300, 3)), 1.0, 49.0)
    pos = jnp.asarray(np.concatenate([field, core]), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 900), jnp.float32)
    box, g, k = 50.0, 6, 64
    G, a, eps = 0.7, (box / g) / 3.0, 0.05

    buckets = pp_buckets_for(pos, box, g, k)
    assert buckets is not None and buckets[0][0] < k, buckets
    acc_u, novf_u = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True
    )
    acc_b, novf_b = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True, buckets=buckets
    )
    assert int(novf_b) == int(novf_u)  # no bucket drops, same cap count
    au, ab = np.asarray(acc_u), np.asarray(acc_b)
    scale = np.abs(au).max()
    np.testing.assert_allclose(ab, au, rtol=2e-5, atol=3e-6 * scale)


def test_pp_pallas_bucketed_drop_counted():
    """An undersized LAST-bucket budget drops whole cells; the dropped
    cells' kept bodies are counted into n_overflow (no-silent-caps) and
    p3m_acceleration surfaces them in n_uncorrected."""
    pos, mass = _scene(n=400, seed=11, lo=1.0, hi=49.0)
    box, g, k = 50.0, 4, 16
    G, a, eps = 0.7, (box / g) / 3.0, 0.05
    _, novf_u = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True
    )
    # tiny budgets: bulk 8 cells, tail 8 cells << 64 occupied cells
    _, novf_b = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True,
        buckets=((8, 8, 8), (16, 16, 8)),
    )
    assert int(novf_b) > int(novf_u)
    _, unc = p3m_acceleration(
        pos, mass, G, box, g=16, n_cells=g, max_per_cell=k, eps=eps,
        max_residual=256, pp_impl="pallas", interpret=True,
        pp_buckets=((8, 8, 8), (16, 16, 8)),
    )
    assert int(unc) > 0


def test_pp_buckets_for_uniform_scene_declines():
    """Near-uniform occupancy: bucketing cannot pay (bulk caps ~ K) and
    the tuner returns None rather than a pointless second launch."""
    from nbx.ops.ppkernel import pp_buckets_for

    # high per-cell counts => tight Poisson (sigma/mu ~ 6%): the 0.8-
    # quantile caps land at ~K and bucketing cannot shed enough lanes
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(1.0, 49.0, (20000, 3)), jnp.float32)
    g = 4
    ijk = np.clip((np.asarray(pos) / (50.0 / g)).astype(int), 0, g - 1)
    cid = (ijk[:, 0] * g + ijk[:, 1]) * g + ijk[:, 2]
    cnt_max = np.bincount(cid, minlength=g**3).max()
    buckets = pp_buckets_for(pos, 50.0, g, int(cnt_max))
    assert buckets is None, buckets


def test_pp_pallas_erfc_accuracy():
    """The in-kernel A&S 7.1.26 erfc: with a >> scene size (erfc -> 1 in
    the force law) the short-range pass alone equals the direct softened
    sum — the same gate the XLA path passes."""
    from nbx import forces

    rng = np.random.default_rng(2)
    pos = jnp.asarray(5.0 + rng.uniform(0, 1.5, (64, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    acc, ovf = short_range_acc_pallas(
        pos, mass, 1.0, 1e3, 100.0, 10, max_per_cell=64, eps=0.2,
        interpret=True,
    )
    want = forces.accelerations(pos, mass, 1.0, 0.2)
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(want), rtol=2e-3, atol=1e-4
    )


def test_pp_pallas_fori_chunk_path():
    """Big-K tunes (the accurate P3M regime) cross _UNROLL_CHUNKS and run
    the lax.fori_loop S-chunk loop instead of the unrolled one (unrolled
    at K=768 the Mosaic register allocator spilled 170 MB of VMEM —
    round-3 measurement). Gate: the fori path is bit-compatible with the
    XLA reference at a (g, K) past the unroll bound."""
    from nbx.ops.ppkernel import _UNROLL_CHUNKS, _round_up

    pos, mass = _scene(n=2200, seed=7, lo=1.0, hi=49.0)
    box, g, k = 50.0, 4, 80  # k8=80 -> 27*80=2160 -> 17 chunks > 16
    assert _round_up(27 * _round_up(k, 8), 128) // 128 > _UNROLL_CHUNKS
    G, a, eps = 0.7, (box / g) / 3.0, 0.05
    table, _, novf, _ = cell_bin_full(pos, box, g, k)
    acc_x, novf_x = short_range_acc(
        pos, mass, G, a, box, g, k, eps, table=table, n_overflow=novf
    )
    acc_p, novf_p = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True
    )
    assert int(novf_p) == int(novf_x)
    ax, ap = np.asarray(acc_x), np.asarray(acc_p)
    scale = np.abs(ax).max()
    np.testing.assert_allclose(ap, ax, rtol=2e-5, atol=3e-6 * scale)


def test_pp_pallas_target_subblock_grid():
    """K past one 128-lane register block: k8 rounds up to a LANE multiple
    and the grid gains a target-sub-block axis (n_sub = k8/128 programs
    per cell, src block loaded once per cell). Parity with the XLA path
    at (g=3, K=200) -> k8=256, n_sub=2, plus the fori chunk loop."""
    pos, mass = _scene(n=1200, seed=11, lo=1.0, hi=29.0)
    box, g, k = 30.0, 3, 200
    G, a, eps = 0.7, (box / g) / 3.0, 0.05
    table, _, novf, _ = cell_bin_full(pos, box, g, k)
    acc_x, novf_x = short_range_acc(
        pos, mass, G, a, box, g, k, eps, table=table, n_overflow=novf
    )
    acc_p, novf_p = short_range_acc_pallas(
        pos, mass, G, a, box, g, k, eps, interpret=True
    )
    assert int(novf_p) == int(novf_x)
    ax, ap = np.asarray(acc_x), np.asarray(acc_p)
    scale = np.abs(ax).max()
    np.testing.assert_allclose(ap, ax, rtol=2e-5, atol=3e-6 * scale)


def test_residual_table_pallas_matches_xla():
    """The scatter-free residual-vs-table pass == the XLA chunked form
    (forward + reaction) on an overflowing clustered scene. Cells are
    sized so beyond-neighborhood pairs carry erfc(>=6) ~ 2e-17 — the
    pallas pass's superset coverage is then numerically identical."""
    import jax.numpy as jnp
    from nbx.ops.p3m import _residual_short_acc, take_rows
    from nbx.ops.ppkernel import residual_table_acc_pallas

    rng = np.random.default_rng(9)
    # clustered core that overflows K, plus a quasi-uniform field
    core = rng.normal(25.0, 1.2, (600, 3))
    field = rng.uniform(1.0, 49.0, (900, 3))
    pos = jnp.asarray(np.clip(np.concatenate([core, field]), 1.0, 49.0),
                      jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 1500), jnp.float32)
    box, g, k, mr = 50.0, 6, 16, 512
    G, a, eps = 0.8, (box / g) / 3.0, 0.05
    table, _, novf, dropped = cell_bin_full(pos, box, g, k)
    assert int(novf) > 100  # overflowing on purpose
    res_idx, res_valid = take_rows(dropped, mr)
    want = _residual_short_acc(
        pos, mass, G, a, eps, box, g, table, res_idx, res_valid,
        include_rr=False,
    )
    got, n_missed = residual_table_acc_pallas(
        pos, mass, G, a, box, g, k, res_idx, res_valid, eps,
        interpret=True,
    )
    assert int(n_missed) == 0
    aw, ag = np.asarray(want), np.asarray(got)
    scale = np.abs(aw).max()
    np.testing.assert_allclose(ag, aw, rtol=2e-5, atol=3e-6 * scale)
    # Newton's third law across the pass: total momentum change ~ 0
    mom = (np.asarray(mass)[:, None] * ag).sum(0)
    assert np.abs(mom).max() < 1e-3 * np.abs(
        np.asarray(mass)[:, None] * ag
    ).sum()


def test_residual_rr_dense_pallas_matches_xla():
    """residual_table_acc_pallas + residual_rr_dense_pallas together ==
    the XLA _residual_short_acc(include_rr=True) — the full dense-mode
    residual correction, scatter-free."""
    import jax.numpy as jnp
    from nbx.ops.p3m import _residual_short_acc, take_rows
    from nbx.ops.ppkernel import (
        residual_rr_dense_pallas, residual_table_acc_pallas,
    )

    rng = np.random.default_rng(9)
    core = rng.normal(25.0, 1.2, (600, 3))
    field = rng.uniform(1.0, 49.0, (900, 3))
    pos = jnp.asarray(np.clip(np.concatenate([core, field]), 1.0, 49.0),
                      jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 1500), jnp.float32)
    box, g, k, mr = 50.0, 6, 16, 512
    G, a, eps = 0.8, (box / g) / 3.0, 0.05
    table, _, novf, dropped = cell_bin_full(pos, box, g, k)
    res_idx, res_valid = take_rows(dropped, mr)
    want = _residual_short_acc(
        pos, mass, G, a, eps, box, g, table, res_idx, res_valid,
        include_rr=True,
    )
    tab, _ = residual_table_acc_pallas(
        pos, mass, G, a, box, g, k, res_idx, res_valid, eps,
        interpret=True,
    )
    rr = residual_rr_dense_pallas(
        pos, mass, G, a, box, res_idx, res_valid, eps, interpret=True
    )
    aw, ag = np.asarray(want), np.asarray(tab + rr)
    scale = np.abs(aw).max()
    np.testing.assert_allclose(ag, aw, rtol=2e-5, atol=3e-6 * scale)


def test_residual_table_pallas_affected_cap_counted():
    """Affected cells beyond affected_cap lose correction but are COUNTED
    (no-silent-caps): n_missed > 0 and the pass still returns finite."""
    import jax.numpy as jnp
    from nbx.ops.p3m import take_rows
    from nbx.ops.ppkernel import residual_table_acc_pallas

    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(1.0, 49.0, (4000, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 4000), jnp.float32)
    box, g, k = 50.0, 8, 4  # heavy uniform overflow -> many affected cells
    G, a = 1.0, (box / g) / 3.0
    _, _, novf, dropped = cell_bin_full(pos, box, g, k)
    res_idx, res_valid = take_rows(dropped, 1024)
    got, n_missed = residual_table_acc_pallas(
        pos, mass, G, a, box, g, k, res_idx, res_valid, 0.05,
        affected_cap=64, interpret=True,
    )
    assert int(n_missed) > 0
    assert np.isfinite(np.asarray(got)).all()


def test_p3m_pallas_impl_end_to_end():
    """p3m_acceleration(pp_impl='pallas') == pp_impl='xla' to fp tolerance
    (kept set and residual machinery identical; main pass fp-only)."""
    pos, mass = _scene(n=900, seed=5)
    box = 50.0
    kw = dict(G=1.0, box_size=box, eps=0.1, g=16, n_cells=6,
              max_per_cell=16, max_residual=256)
    acc_x, unc_x = p3m_acceleration(pos, mass, **kw, pp_impl="xla")
    acc_p, unc_p = p3m_acceleration(
        pos, mass, **kw, pp_impl="pallas", interpret=True
    )
    assert int(unc_p) == int(unc_x)
    ax, ap = np.asarray(acc_x), np.asarray(acc_p)
    scale = np.abs(ax).max()
    np.testing.assert_allclose(ap, ax, rtol=2e-5, atol=3e-6 * scale)
