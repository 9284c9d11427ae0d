"""Sphere-impostor surface pass: coverage geometry, determinism, spin,
temperature->magma response (reference shader semantics, index.html:99-202)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from nbx.render.impostor import (
    draw_impostors, simplex_noise3, surface_detail, value_noise3,
)
from nbx.render.splat import Camera

W, H = 320, 180


def _one_body(temp=0.0, r=5.0):
    pos = jnp.asarray([[0.0, 0.0, 0.0]])
    return dict(
        pos=pos,
        radius=jnp.asarray([r]),
        temp=jnp.asarray([temp]),
        mat=jnp.zeros(1, jnp.int32),
        alive=jnp.asarray([True]),
        color1=jnp.asarray([[0.8, 0.5, 0.3]]),
        color2=jnp.asarray([[0.2, 0.2, 0.25]]),
    )


def _cam():
    return dataclasses.replace(
        Camera.default(), eye=jnp.asarray([0.0, 0.0, 40.0])
    )


def _render(body, time=0.0):
    img = jnp.zeros((H, W, 3), jnp.float32)
    out, _ = draw_impostors(
        img, body["pos"], body["radius"], body["temp"], body["mat"],
        body["alive"], body["color1"], body["color2"], _cam(), time,
        width=W, height=H, n_impostors=4,
    )
    return np.asarray(out)


def test_noise_range_and_determinism():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-10, 10, (1000, 3)), jnp.float32)
    n1 = np.asarray(value_noise3(p, 3.0))
    n2 = np.asarray(value_noise3(p, 3.0))
    n3 = np.asarray(value_noise3(p, 4.0))
    assert n1.min() >= -1.0 and n1.max() <= 1.0
    np.testing.assert_array_equal(n1, n2)  # deterministic
    assert np.abs(n1 - n3).max() > 0.1  # seed actually matters
    d, _ = surface_detail(p, 3.0)
    assert np.abs(np.asarray(d)).max() <= 1.0


def test_simplex_noise_properties():
    """True simplex noise (index.html:118-162 semantics): bounded to
    [-1, 1], zero-mean-ish, continuous, deterministic, and offset-
    sensitive (the reference seeds by position offset, L166-167)."""
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-20, 20, (4000, 3)), jnp.float32)
    n = np.asarray(simplex_noise3(p))
    assert np.abs(n).max() <= 1.0
    assert abs(n.mean()) < 0.1
    assert n.std() > 0.15  # real texture, not a constant
    np.testing.assert_array_equal(n, np.asarray(simplex_noise3(p)))
    # seed-as-offset changes the field
    n_off = np.asarray(simplex_noise3(p + 37.0))
    assert np.abs(n - n_off).max() > 0.1
    # continuity: a tiny step moves the value a little, not a jump
    dn = np.asarray(simplex_noise3(p + 1e-3)) - n
    assert np.abs(dn).max() < 0.05
    # detail octaves stay bounded
    d, n2 = surface_detail(p, 3.0)
    assert np.abs(np.asarray(d)).max() <= 1.0
    assert np.abs(np.asarray(n2)).max() <= 1.0


def _grid_scene(n_side):
    """n_side^2 equal spheres in a camera-facing grid, all discs visible
    and disjoint at the default 45-degree camera from z=40."""
    k = n_side * n_side
    xs = (np.arange(n_side) - (n_side - 1) / 2.0) * 2.2
    gx, gy = np.meshgrid(xs, xs)
    pos = np.stack([gx.ravel(), gy.ravel(), np.zeros(k)], -1)
    return dict(
        pos=jnp.asarray(pos, jnp.float32),
        radius=jnp.full((k,), 0.9, jnp.float32),
        temp=jnp.zeros(k),
        mat=jnp.zeros(k, jnp.int32),
        alive=jnp.ones(k, bool),
        color1=jnp.asarray([[0.8, 0.5, 0.3]]),
        color2=jnp.asarray([[0.2, 0.2, 0.25]]),
    )


def test_chunked_selection_matches_small_k():
    """The chunked multi-pass winner (K > 32) bit-matches a single-chunk
    render when the extra candidate slots are empty."""
    body = _grid_scene(3)  # 9 bodies
    img = jnp.zeros((H, W, 3), jnp.float32)
    args = (img, body["pos"], body["radius"], body["temp"], body["mat"],
            body["alive"], body["color1"], body["color2"], _cam(), 0.0)
    a, da = draw_impostors(*args, width=W, height=H, n_impostors=16)
    b, db = draw_impostors(*args, width=W, height=H, n_impostors=80)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(da), np.asarray(db))


def test_256_body_closeup_all_shaded():
    """VERDICT 8b: with n_impostors=256 a 256-body close-up keeps surface
    texture on EVERY body — each disc's centre pixel is impostor-covered
    (reference shades every planet, index.html:484-498)."""
    from nbx.render.splat import project

    body = _grid_scene(16)  # 256 bodies
    img = jnp.zeros((H, W, 3), jnp.float32)
    out, depth = draw_impostors(
        img, body["pos"], body["radius"], body["temp"], body["mat"],
        body["alive"], body["color1"], body["color2"], _cam(), 0.0,
        width=W, height=H, n_impostors=256,
    )
    depth = np.asarray(depth)
    px, py, _ = project(_cam(), body["pos"], W, H)
    px = np.clip(np.asarray(px).round().astype(int), 0, W - 1)
    py = np.clip(np.asarray(py).round().astype(int), 0, H - 1)
    assert np.isfinite(depth[py, px]).all(), "every disc centre shaded"
    # textured, not flat: the shaded output varies across each disc
    out = np.asarray(out)
    assert out[depth < np.inf].std() > 0.01


def test_disc_coverage_and_opacity():
    """The impostor covers a filled round disc of the projected radius and
    REPLACES the buffer (opaque), leaving the outside untouched."""
    body = _one_body(r=5.0)
    img = jnp.full((H, W, 3), 7.0, jnp.float32)  # sentinel background
    out, depth = draw_impostors(
        img, body["pos"], body["radius"], body["temp"], body["mat"],
        body["alive"], body["color1"], body["color2"], _cam(), 0.0,
        width=W, height=H, n_impostors=4,
    )
    out, depth = np.asarray(out), np.asarray(depth)
    covered = np.any(out != 7.0, axis=-1)
    # depth buffer: finite front-surface z on the disc, +inf elsewhere
    assert np.isfinite(depth[covered]).all()
    assert np.isinf(depth[~covered]).all()
    # camera at z=40 looking at the origin: front surface ~ 40 - r/2..40 - r
    assert 30.0 < depth[covered].min() <= 40.0
    # projected radius = r * focal / z; focal = (H/2)/tan(22.5deg)
    pr = 5.0 * (H / 2) / np.tan(np.deg2rad(22.5)) / 40.0
    area = covered.sum()
    assert abs(area - np.pi * pr * pr) < 0.15 * np.pi * pr * pr, (area, pr)
    # roughly centred and round: bounding box ~ square of side 2 pr
    ys, xs = np.where(covered)
    assert abs((xs.max() - xs.min()) - (ys.max() - ys.min())) <= 3
    # untouched outside
    assert (out[~covered] == 7.0).all()


def test_render_deterministic_and_spin_moves_texture():
    body = _one_body(temp=0.0)
    a = _render(body, time=0.0)
    b = _render(body, time=0.0)
    np.testing.assert_array_equal(a, b)
    c = _render(body, time=2.0)
    cov = np.any(a > 0, -1)
    assert np.any(a != c), "spin must move the surface texture"
    # same coverage though — the sphere itself doesn't move
    np.testing.assert_array_equal(cov, np.any(c > 0, -1))


def test_magma_glow_follows_temperature():
    """A hot body (T >= 50) shows the crack-magma emissive: much more red
    energy than the same body cold (L188-194)."""
    cold = _render(_one_body(temp=0.0))
    hot = _render(_one_body(temp=100.0))
    assert hot[..., 0].sum() > 2.0 * cold[..., 0].sum()
    # heat color is red-dominant: red gain exceeds blue gain
    red_gain = hot[..., 0].sum() - cold[..., 0].sum()
    blue_gain = hot[..., 2].sum() - cold[..., 2].sum()
    assert red_gain > blue_gain


def test_depth_buffer_occludes_splats():
    """Splats of bodies BEHIND an impostor disc are hidden; bodies in FRONT
    still draw (the z-buffer the reference gets from WebGL)."""
    from nbx.render.splat import splat_bodies_hdr

    body = _one_body(r=5.0)  # planet at origin, camera at z=40
    _, depth = draw_impostors(
        jnp.zeros((H, W, 3), jnp.float32),
        body["pos"], body["radius"], body["temp"], body["mat"],
        body["alive"], body["color1"], body["color2"], _cam(), 0.0,
        width=W, height=H, n_impostors=4,
    )

    def splat_at(zpos):
        pos = jnp.asarray([[0.0, 0.0, zpos]])
        img = splat_bodies_hdr(
            pos, jnp.asarray([0.5]), jnp.zeros(1), jnp.zeros(1, jnp.int32),
            jnp.asarray([True]), body["color1"], body["color2"], _cam(),
            width=W, height=H, depth=depth,
        )
        return float(jnp.sum(img))

    assert splat_at(-20.0) == 0.0  # behind the planet: hidden
    assert splat_at(20.0) > 0.0  # in front: visible
    # the planet's own splat is self-culled inside its disc
    own = splat_bodies_hdr(
        body["pos"], body["radius"], body["temp"], body["mat"],
        body["alive"], body["color1"], body["color2"], _cam(),
        width=W, height=H, depth=depth,
    )
    assert float(jnp.sum(own)) == 0.0


def test_nearest_body_wins_overlap():
    """Two overlapping discs: the nearer body's material colors the
    overlap region."""
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 20.0]])  # 2nd is nearer
    body = dict(
        pos=pos,
        radius=jnp.asarray([5.0, 2.0]),
        temp=jnp.zeros(2),
        mat=jnp.asarray([0, 1], jnp.int32),
        alive=jnp.asarray([True, True]),
        color1=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
        color2=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
    )
    out = _render(body)
    # the screen centre belongs to the nearer (blue, mat 1) body
    centre = out[H // 2, W // 2]
    assert centre[2] > centre[0], centre