"""Body color model — the point-splat echo of the reference planet shader.

The reference fragment shader (/root/reference/index.html:99-202) mixes two
material colors by surface noise (L171), adds magma glow in noise cracks
scaled by clamp(T/50, 0, 1) with heat color (1.0, 0.3, 0.1) (L188-191), and
a whole-body glow above T = 50 (L194). A point splat has no surface, so the
per-body color collapses the ramp:

    base  = mix(color2, color1, 0.5)            # mean of the noise mix
    hot   = lerp(base, (1.0, 0.3, 0.1), clamp(T / 50, 0, 1) * 0.7)
    glow  = 1 + heat_to_glow * max(T - 50, 0) / 50   # emissive boost (L194,
            CONFIG.heatToGlow index.html:68)

Brightness follows apparent size (radius^2) like a rasterized sphere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HEAT_COLOR = jnp.array([1.0, 0.3, 0.1], jnp.float32)  # index.html:191
GLOW_TEMP = 50.0  # index.html:188, 194


def body_color(
    temp: jax.Array,  # [N]
    mat: jax.Array,  # [N] i32
    color1: jax.Array,  # [M, 3]
    color2: jax.Array,  # [M, 3]
    heat_to_glow: float = 3.0,
) -> jax.Array:
    """Per-body emissive RGB, [N, 3] f32 (unbounded — tonemapped later)."""
    base = 0.5 * (color1[mat] + color2[mat])
    heat = jnp.clip(temp / GLOW_TEMP, 0.0, 1.0)[:, None]
    col = base * (1.0 - 0.7 * heat) + HEAT_COLOR * (0.7 * heat)
    glow = 1.0 + heat_to_glow * jnp.maximum(temp - GLOW_TEMP, 0.0)[:, None] / GLOW_TEMP
    return col * glow


def tonemap(hdr: jax.Array, exposure: float = 1.0) -> jax.Array:
    """Filmic-ish tonemap + gamma, [H, W, 3] f32 -> [H, W, 3] in [0, 1].
    (The reference uses ACESFilmic with exposure 1.0, index.html:712-713;
    this is the cheap Reinhard-exp approximation of the same shape.)"""
    x = 1.0 - jnp.exp(-hdr * exposure)
    return jnp.power(jnp.clip(x, 0.0, 1.0), 1.0 / 2.2)
