"""Ribbon trails — device-side history buffer.

The reference keeps a per-body position history (`history.unshift(pos)`
capped at trailLength, /root/reference/index.html:564-565) and rebuilds a
camera-facing ribbon every frame with width tapering to zero at the tail
(width = radius * 0.8 * (1 - i/(len-1)), L570-593).

TPU version: a rolling [C, L, 3] ring buffer updated in one masked
dynamic-update per frame (no host work), splatted as fading points whose
intensity and size taper like the reference's ribbon width.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from nbx.render.colormap import body_color


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrailState:
    """Ring buffer: pos[C, L, 3], valid[C, L], head [] (next write index)."""

    pos: jax.Array
    valid: jax.Array
    head: jax.Array

    @staticmethod
    def create(capacity: int, length: int = 80) -> "TrailState":
        return TrailState(
            pos=jnp.zeros((capacity, length, 3), jnp.float32),
            valid=jnp.zeros((capacity, length), bool),
            head=jnp.zeros((), jnp.int32),
        )

    @property
    def length(self) -> int:
        return self.pos.shape[1]


@jax.jit
def update(trails: TrailState, body_pos: jax.Array, alive: jax.Array) -> TrailState:
    """Push current positions (history.unshift, L564); dead bodies' trails
    invalidate so a reused slot starts clean (garbageCollect, L599-617)."""
    h = trails.head % trails.length
    pos = trails.pos.at[:, h, :].set(body_pos)
    valid = trails.valid.at[:, h].set(alive)
    valid = valid & alive[:, None]  # clear history of dead slots
    return TrailState(pos=pos, valid=valid, head=trails.head + 1)


@partial(jax.jit, static_argnames=("width", "height"))
def splat_trails(
    img_hdr: jax.Array,  # [H, W, 3] HDR buffer (pre-tonemap)
    trails: TrailState,
    radius: jax.Array,  # [C]
    temp: jax.Array,  # [C]
    mat: jax.Array,  # [C]
    color1: jax.Array,
    color2: jax.Array,
    cam,
    width: int = 640,
    height: int = 360,
    gain: float = 0.08,
) -> jax.Array:
    """Additive fading trail points: intensity tapers with age like the
    reference ribbon's width taper (L570-571)."""
    from nbx.render.splat import project

    c, length = trails.valid.shape
    # age 0 = newest sample (one before head)
    idx = (trails.head - 1 - jnp.arange(length)) % length  # [L] by age
    pos_by_age = trails.pos[:, idx, :]  # [C, L, 3]
    valid_by_age = trails.valid[:, idx]  # [C, L]
    taper = (1.0 - jnp.arange(length) / max(length - 1, 1))[None, :]  # [1, L]

    flat_pos = pos_by_age.reshape(c * length, 3)
    px, py, z = project(cam, flat_pos, width, height)
    px = px.reshape(c, length)
    py = py.reshape(c, length)
    z = z.reshape(c, length)

    visible = (
        valid_by_age
        & (z > 1e-3)
        & (px >= 0)
        & (px < width - 1)
        & (py >= 0)
        & (py < height - 1)
    )
    col = body_color(temp, mat, color1, color2)  # [C, 3]
    inten = jnp.where(visible, gain * taper * radius[:, None], 0.0)  # [C, L]
    rgb = col[:, None, :] * inten[:, :, None]  # [C, L, 3]

    x0 = jnp.clip(jnp.round(px).astype(jnp.int32), 0, width - 1).reshape(-1)
    y0 = jnp.clip(jnp.round(py).astype(jnp.int32), 0, height - 1).reshape(-1)
    return img_hdr.at[y0, x0].add(rgb.reshape(c * length, 3), mode="drop")
