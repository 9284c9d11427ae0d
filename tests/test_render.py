"""Renderer tests: projection geometry, splat energy, flashes, PNG bytes."""

import os
import struct
import zlib

import jax.numpy as jnp
import numpy as np

from nbx import scene
from nbx.config import SimConfig
from nbx.render import splat, viewer
from nbx.render.colormap import body_color, tonemap
from nbx.render.splat import Camera


def test_project_center_and_depth():
    cam = Camera(eye=jnp.array([0.0, 0, 100.0]), target=jnp.zeros(3),
                 up=jnp.array([0.0, 1, 0]))
    pos = jnp.array([[0.0, 0, 0], [0, 0, 200.0]])  # origin + behind camera
    px, py, z = splat.project(cam, pos, 640, 360)
    np.testing.assert_allclose([float(px[0]), float(py[0])], [320, 180], atol=1e-3)
    assert float(z[0]) == 100.0
    assert float(z[1]) < 0  # behind


def test_splat_renders_visible_bodies():
    cfg = SimConfig()
    st = scene.make_state(cfg, scene.reference_galaxy(n_disk=30, seed=0))
    img = np.asarray(splat.render_state(st, cfg, width=320, height=180))
    assert img.shape == (180, 320, 3)
    assert img.min() >= 0 and img.max() <= 1
    assert (img.sum(-1) > 0.05).sum() > 20  # bodies actually visible
    # hot core (T=1000) is the brightest thing on screen at the center
    cy, cx = np.unravel_index(img.sum(-1).argmax(), img.sum(-1).shape)
    assert abs(cx - 160) < 8 and abs(cy - 90) < 8


def test_big_splat_wide_footprint():
    """A near body (apparent radius >> 5 px) spreads its light beyond the
    5x5 tap window via the 11x11 tier instead of clipping to a dot."""
    cam = Camera.default()
    fwd = (cam.target - cam.eye) / jnp.linalg.norm(cam.target - cam.eye)
    pos = (cam.eye + fwd * 40.0)[None, :]  # close to the camera
    img = np.asarray(
        splat.splat_frame(
            pos,
            jnp.asarray([1.5]),  # apparent radius ~ 434*1.5/40 ~ 16 px
            jnp.asarray([0.0]),
            jnp.zeros(1, jnp.int32),
            jnp.asarray([True]),
            SimConfig().materials.color1,
            SimConfig().materials.color2,
            cam,
            width=320,
            height=180,
        )
    )
    lum = img.sum(-1)
    cy, cx = np.unravel_index(lum.argmax(), lum.shape)
    # light must reach past the 5x5 window (offset 2) from the peak
    assert lum[cy, cx + 4] > 0.02 * lum[cy, cx] > 0.0
    assert (lum > 0.01 * lum[cy, cx]).sum() > 25  # wider than 5x5


def test_dead_bodies_not_rendered():
    cfg = SimConfig(capacity=4)
    st = scene.make_state(cfg, scene.head_on_collision())
    img1 = np.asarray(splat.render_state(st, cfg, width=160, height=90))
    st2 = st.replace(alive=st.alive & False)
    img2 = np.asarray(splat.render_state(st2, cfg, width=160, height=90))
    assert img1.sum() > 0 and img2.sum() == 0


def test_hot_bodies_glow_brighter():
    temp = jnp.array([0.0, 200.0])
    mat = jnp.array([0, 0])
    from nbx.config import default_materials

    m = default_materials()
    col = np.asarray(body_color(temp, mat, m.color1, m.color2))
    assert col[1].sum() > col[0].sum() * 2  # emissive boost above T=50
    assert col[1][0] > col[1][2]  # heat color is red-dominant


def test_flashes_add_light():
    img = jnp.zeros((90, 160, 3))
    out = splat.add_flashes(
        img,
        jnp.array([[0.0, 0, 0]]),
        jnp.array([50.0]),
        jnp.array([True]),
        Camera(eye=jnp.array([0.0, 0, 100.0]), target=jnp.zeros(3),
               up=jnp.array([0.0, 1, 0])),
        width=160,
        height=90,
    )
    a = np.asarray(out)
    assert a.max() > 1.0  # HDR flash energy (min(0.2*50, 15) = 10)
    assert a[45, 80, 0] > a[45, 80, 2]  # 0xffaa00 is red>blue


def test_tonemap_range():
    x = jnp.array([[[0.0, 1.0, 100.0]]])
    y = np.asarray(tonemap(x))
    assert 0 <= y.min() and y.max() <= 1
    # moderate exposure keeps channel ordering despite ACES crosstalk
    y2 = np.asarray(tonemap(jnp.array([[[0.0, 0.5, 2.0]]])))
    assert y2[0, 0, 2] > y2[0, 0, 1] > y2[0, 0, 0]


def test_tonemap_aces_matches_threejs_curve():
    """The default tonemap is three.js's ACESFilmicToneMapping (Stephen
    Hill RRT+ODT fit, exposure/0.6 prescale, reference index.html:712-713)
    — checked on GRAY inputs where the matrix crosstalk collapses (rows of
    both matrices sum to ~1) so the scalar fit is the whole curve."""
    for v in (0.18, 0.5, 1.0, 4.0):
        g = v / 0.6
        # gray vector through the input matrix stays (row-sum * g) ~ g
        rs_in = np.array([0.59719 + 0.35458 + 0.04823,
                          0.07600 + 0.90834 + 0.01566,
                          0.02840 + 0.13383 + 0.83777])
        c = rs_in * g
        fit = (c * (c + 0.0245786) - 0.000090537) / (
            c * (0.983729 * c + 0.4329510) + 0.238081)
        out = np.array([
            1.60475 * fit[0] - 0.53108 * fit[1] - 0.07367 * fit[2],
            -0.10208 * fit[0] + 1.10813 * fit[1] - 0.00605 * fit[2],
            -0.00327 * fit[0] - 0.07276 * fit[1] + 1.07602 * fit[2],
        ])
        want = np.clip(out, 0.0, 1.0) ** (1 / 2.2)
        got = np.asarray(tonemap(jnp.full((1, 1, 3), v)))[0, 0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # monotone on a gray ramp, saturates toward 1
    ramp = np.asarray(tonemap(jnp.linspace(0, 20, 64)[:, None, None]
                              * jnp.ones((1, 1, 3))))
    lum = ramp.sum(-1)[:, 0]
    assert (np.diff(lum) >= -1e-6).all()
    assert lum[-1] > 2.7  # ~3 channels near 1
    # legacy mode still available
    y = np.asarray(tonemap(jnp.array([[[0.5, 0.5, 0.5]]]), mode="reinhard"))
    np.testing.assert_allclose(
        y, ((1 - np.exp(-0.5)) ** (1 / 2.2)) * np.ones((1, 1, 3)), rtol=1e-5
    )


def test_png_writer_valid(tmp_path):
    img = np.zeros((8, 8, 3), np.float32)
    img[2, 3] = [1.0, 0.5, 0.0]
    p = str(tmp_path / "t.png")
    viewer.write_png(p, img)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (8, 8)
    # decode IDAT and check the pixel round-trips
    idat_start = raw.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", raw[idat_start - 8 : idat_start - 4])[0]
    rows = zlib.decompress(raw[idat_start : idat_start + idat_len])
    px = rows[2 * (1 + 8 * 3) + 1 + 3 * 3 : 2 * (1 + 8 * 3) + 1 + 3 * 3 + 3]
    assert px == bytes([255, 128, 0])


def test_trajectory_and_player(tmp_path):
    pos = np.random.default_rng(0).normal(size=(4, 10, 3)).astype(np.float32)
    rad = np.ones(10, np.float32)
    tj = str(tmp_path / "t.json")
    viewer.record_trajectory(tj, pos, rad, stride=2)
    html = str(tmp_path / "p.html")
    viewer.write_html_player(html, tj)
    s = open(html).read()
    assert "requestAnimationFrame" in s and '"pos"' in s


def test_async_readback_order():
    from nbx.render.viewer import AsyncReadback
    import jax.numpy as jnp

    rb = AsyncReadback()
    assert rb.push(jnp.zeros((2, 2, 3)) + 1) is None
    out = rb.push(jnp.zeros((2, 2, 3)) + 2)
    np.testing.assert_allclose(out, 1.0)  # frame k returned while k+1 pends
    np.testing.assert_allclose(rb.flush(), 2.0)
    assert rb.flush() is None
