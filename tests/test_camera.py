"""Camera geometry: orbit controls and the spawn raycast
(reference input layer, index.html:716-722, 787-790)."""

import jax.numpy as jnp
import numpy as np

from nbx.config import SimConfig
from nbx.interactive import Simulation
from nbx.render.splat import Camera, project, screen_to_plane


def test_screen_to_plane_roundtrip():
    """project() then screen_to_plane() returns the original y=0 point."""
    cam = Camera.default()
    world = jnp.array([[12.0, 0.0, -7.0]])
    px, py, z = project(cam, world, 640, 360)
    pt, hit = screen_to_plane(cam, float(px[0]), float(py[0]), 640, 360)
    assert bool(hit)
    np.testing.assert_allclose(np.asarray(pt), [12.0, 0.0, -7.0], atol=1e-3)


def test_screen_to_plane_miss():
    """A ray pointing above the horizon never hits y=0."""
    cam = Camera.default()  # eye at y=80 looking slightly down
    pt, hit = screen_to_plane(cam, 320.0, -2000.0, 640, 360)  # far above view
    assert not bool(hit)


def test_orbit_preserves_distance():
    cam = Camera.default()
    r0 = float(jnp.linalg.norm(cam.eye - cam.target))
    cam2 = cam.orbit(d_yaw=1.0, d_pitch=0.3)
    r1 = float(jnp.linalg.norm(cam2.eye - cam2.target))
    np.testing.assert_allclose(r1, r0, rtol=1e-5)
    assert not np.allclose(np.asarray(cam2.eye), np.asarray(cam.eye))


def test_orbit_zoom():
    cam = Camera.default()
    r0 = float(jnp.linalg.norm(cam.eye - cam.target))
    cam2 = cam.orbit(zoom=0.5)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(cam2.eye - cam2.target)), r0 * 0.5, rtol=1e-5
    )


def test_spawn_drag_screen():
    s = Simulation(SimConfig(capacity=8, collisions=False), scenario="collision")
    cam = Camera.default()
    ok_n = s.n_alive
    spawned, evicted = s.spawn_drag_screen(cam, 320, 200, 360, 200)
    assert spawned and not evicted  # capacity 8, plenty of room
    assert s.n_alive == ok_n + 1
    b = s.bodies()
    # spawned on the y=0 plane with slingshot velocity opposite the drag
    assert abs(b["pos"][-1][1]) < 1e-3
    assert np.linalg.norm(b["vel"][-1]) > 0


def test_camera_pan():
    """Pan translates eye AND target along the view plane (OrbitControls
    right-drag pan, index.html:721); the orbit radius is preserved."""
    cam = Camera.default()
    r0 = float(jnp.linalg.norm(cam.eye - cam.target))
    cam2 = cam.pan(0.1, 0.0)
    moved = np.asarray(cam2.target - cam.target)
    assert np.linalg.norm(moved) > 1.0  # scaled by orbit radius
    np.testing.assert_allclose(
        np.asarray(cam2.eye - cam2.target), np.asarray(cam.eye - cam.target),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        float(jnp.linalg.norm(cam2.eye - cam2.target)), r0, rtol=1e-6
    )
    # pan is along the view plane: no displacement along the view axis
    fwd = np.asarray(cam.target - cam.eye)
    fwd = fwd / np.linalg.norm(fwd)
    assert abs(moved @ fwd) < 1e-4
