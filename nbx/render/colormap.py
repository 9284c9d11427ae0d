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
import numpy as np

HEAT_COLOR = np.array([1.0, 0.3, 0.1], np.float32)  # index.html:191
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


# three.js ACESFilmicToneMapping (the reference's renderer.toneMapping,
# index.html:712-713): the Stephen Hill RRT+ODT rational fit, bracketed by
# fixed RGB<->"ACES-ish" matrices. GLSL mat3 literals are COLUMN-major;
# these are the equivalent row-major matrices for row-vector pixels.
_ACES_IN = np.array(
    [[0.59719, 0.35458, 0.04823],
     [0.07600, 0.90834, 0.01566],
     [0.02840, 0.13383, 0.83777]], np.float32)
_ACES_OUT = np.array(
    [[1.60475, -0.53108, -0.07367],
     [-0.10208, 1.10813, -0.00605],
     [-0.00327, -0.07276, 1.07602]], np.float32)


def tonemap(hdr: jax.Array, exposure: float = 1.0,
            mode: str = "aces") -> jax.Array:
    """Tonemap + gamma, [H, W, 3] f32 -> [H, W, 3] in [0, 1].

    mode="aces" (default) is the EXACT three.js ACESFilmicToneMapping the
    reference configures (index.html:712-713): color *= exposure / 0.6,
    input matrix, RRTAndODTFit a(v)/b(v), output matrix, saturate — then
    the sRGB-ish display gamma. mode="reinhard" keeps the round-1/2
    Reinhard-exp approximation (cheaper, softer shoulder)."""
    if mode == "aces":
        c = jnp.maximum(hdr, 0.0) * (exposure / 0.6)
        c = c @ jnp.asarray(_ACES_IN.T)
        a = c * (c + 0.0245786) - 0.000090537
        b = c * (0.983729 * c + 0.4329510) + 0.238081
        c = (a / b) @ jnp.asarray(_ACES_OUT.T)
        x = jnp.clip(c, 0.0, 1.0)
    else:
        x = jnp.clip(1.0 - jnp.exp(-hdr * exposure), 0.0, 1.0)
    return jnp.power(x, 1.0 / 2.2)
