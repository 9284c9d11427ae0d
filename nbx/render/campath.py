"""Camera paths for demo movies — smooth orbit sweeps and keyframe moves.

The reference's camera is hand-driven (OrbitControls with damping,
/root/reference/index.html:716-722); for scripted demo MOVIES the engine
needs deterministic per-frame cameras. Two generators:

  * orbit_path: a continuous orbit sweep (yaw/pitch/zoom deltas spread
    over the clip with ease-in-out), the classic showcase move.
  * keyframe_path: piecewise interpolation through a list of Camera
    keyframes — eye is interpolated in the ORBIT parameterization around
    each segment's target (radius/yaw/pitch), so moves circle bodies
    instead of cutting through them; targets lerp linearly.

Pure host-side; each yielded Camera feeds the jitted render path
unchanged (Camera fields are traced pytree leaves, so a moving camera
does not retrigger compilation).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import jax.numpy as jnp

from nbx.render.splat import Camera


def ease_in_out(t):
    """Smoothstep easing on [0, 1] — the damping feel of OrbitControls
    (index.html:717) for scripted moves."""
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _to_orbit(cam: Camera):
    rel = cam.eye - cam.target
    r = jnp.linalg.norm(rel)
    yaw = jnp.arctan2(rel[0], rel[2])
    pitch = jnp.arcsin(jnp.clip(rel[1] / jnp.maximum(r, 1e-9), -1.0, 1.0))
    return r, yaw, pitch


def _from_orbit(target, up, r, yaw, pitch, fov_deg):
    eye = target + r * jnp.array(
        [jnp.cos(pitch) * jnp.sin(yaw), jnp.sin(pitch),
         jnp.cos(pitch) * jnp.cos(yaw)]
    )
    return Camera(eye=eye, target=target, up=up, fov_deg=fov_deg)


def orbit_path(
    cam: Camera,
    n_frames: int,
    d_yaw: float = 2.0 * 3.141592653589793,
    d_pitch: float = 0.0,
    zoom: float = 1.0,
    ease: bool = False,
) -> Iterator[Camera]:
    """Sweep the orbit by d_yaw/d_pitch radians and a total zoom factor
    over n_frames (defaults: one full turn). ease=True applies smoothstep
    pacing; False (default) is constant angular speed, which is what a
    looping turntable wants."""
    r0, yaw0, pitch0 = _to_orbit(cam)
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        s = float(ease_in_out(t)) if ease else t
        yield _from_orbit(
            cam.target,
            cam.up,
            r0 * zoom**s,
            yaw0 + d_yaw * s,
            jnp.clip(pitch0 + d_pitch * s, -1.45, 1.45),
            cam.fov_deg,
        )


def keyframe_path(
    keys: Sequence[Camera], n_frames: int, ease: bool = True
) -> Iterator[Camera]:
    """Interpolate through Camera keyframes over n_frames total (segments
    get equal frame budgets). Eye moves in orbit space around the
    interpolated target — radius, yaw, and pitch lerp (yaw via the short
    way around), so a keyframe on the far side orbits rather than
    dollying through the scene."""
    if len(keys) < 2:
        raise ValueError("keyframe_path needs at least 2 keyframes")
    n_seg = len(keys) - 1
    for i in range(n_frames):
        u = i / max(n_frames - 1, 1) * n_seg
        seg = min(int(u), n_seg - 1)
        t = u - seg
        if ease:
            t = ease_in_out(t)
        a, b = keys[seg], keys[seg + 1]
        target = a.target + (b.target - a.target) * t
        up = a.up + (b.up - a.up) * t
        ra, ya, pa = _to_orbit(a)
        rb, yb, pb = _to_orbit(b)
        dy = jnp.mod(yb - ya + jnp.pi, 2.0 * jnp.pi) - jnp.pi  # short way
        fov = a.fov_deg + (b.fov_deg - a.fov_deg) * float(t)
        yield _from_orbit(
            target, up / jnp.maximum(jnp.linalg.norm(up), 1e-9),
            ra + (rb - ra) * t, ya + dy * t, pa + (pb - pa) * t, fov,
        )
