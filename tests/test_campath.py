"""Camera-path generators: endpoint fidelity, orbit-space interpolation."""

import numpy as np
import pytest
import jax.numpy as jnp

from nbx.render.campath import ease_in_out, keyframe_path, orbit_path
from nbx.render.splat import Camera


def _cam(eye, target=(0.0, 0.0, 0.0)):
    return Camera(
        eye=jnp.asarray(eye, jnp.float32),
        target=jnp.asarray(target, jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0]),
    )


def test_orbit_path_full_turn_returns_home():
    cam = _cam([0.0, 80.0, 150.0])
    frames = list(orbit_path(cam, 101))
    assert len(frames) == 101
    np.testing.assert_allclose(
        np.asarray(frames[-1].eye), np.asarray(cam.eye), atol=1e-3
    )
    # radius is preserved frame-to-frame at zoom=1
    for f in frames[:: 20]:
        r = float(jnp.linalg.norm(f.eye - f.target))
        np.testing.assert_allclose(r, float(jnp.linalg.norm(cam.eye)),
                                   rtol=1e-5)


def test_orbit_path_zoom_lands_on_factor():
    cam = _cam([0.0, 0.0, 100.0])
    frames = list(orbit_path(cam, 11, d_yaw=0.0, zoom=0.25))
    r_end = float(jnp.linalg.norm(frames[-1].eye - frames[-1].target))
    np.testing.assert_allclose(r_end, 25.0, rtol=1e-5)


def test_keyframe_path_hits_keyframes():
    a = _cam([0.0, 0.0, 100.0])
    b = _cam([50.0, 20.0, 0.0], target=(10.0, 0.0, 0.0))
    frames = list(keyframe_path([a, b], 21))
    np.testing.assert_allclose(np.asarray(frames[0].eye),
                               np.asarray(a.eye), atol=1e-4)
    np.testing.assert_allclose(np.asarray(frames[-1].eye),
                               np.asarray(b.eye), atol=1e-3)
    np.testing.assert_allclose(np.asarray(frames[-1].target),
                               np.asarray(b.target), atol=1e-5)


def test_keyframe_path_orbits_not_dollies():
    """Opposite-side keyframes must keep the camera at radius, not pass
    through the target."""
    a = _cam([0.0, 0.0, 100.0])
    b = _cam([100.0 * np.sin(2.5), 0.0, 100.0 * np.cos(2.5)])
    for f in keyframe_path([a, b], 31):
        r = float(jnp.linalg.norm(f.eye - f.target))
        assert r > 95.0, r


def test_keyframe_path_needs_two():
    with pytest.raises(ValueError):
        list(keyframe_path([_cam([0, 0, 1.0])], 5))


def test_ease_monotone_and_clamped():
    t = jnp.linspace(-0.5, 1.5, 41)
    y = np.asarray(ease_in_out(t))
    assert y.min() == 0.0 and y.max() == 1.0
    assert (np.diff(y) >= -1e-7).all()
