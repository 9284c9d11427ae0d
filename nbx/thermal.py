"""Thermal model (reference: index.html:227-230, 335-336).

Heating is applied inside collision resolution:
  dT = (impact_energy / mass) * 0.2 per body of an approaching overlap pair
(index.html:335-336). Decay runs once per substep after the second half-kick:
  T *= heat_decay; T < 0.1 -> 0   (index.html:227-230, called at index.html:260)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HEAT_FRACTION = 0.2  # fraction of specific impact energy converted to heat
SNAP_TO_ZERO = 0.1  # temperatures below this snap to exactly 0


def decay(temp: jax.Array, heat_decay: jax.Array | float) -> jax.Array:
    t = temp * heat_decay
    return jnp.where(t < SNAP_TO_ZERO, 0.0, t)


def impact_heating(impact_energy: jax.Array, mass: jax.Array) -> jax.Array:
    """Temperature increment for one body from one impact (index.html:335)."""
    safe_m = jnp.where(mass > 0, mass, 1.0)
    return jnp.where(mass > 0, impact_energy / safe_m * HEAT_FRACTION, 0.0)
