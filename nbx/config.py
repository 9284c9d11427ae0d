"""Simulation configuration for nbx.

Mirrors the reference `CONFIG` object (reference: /root/reference/index.html:52-75)
field-for-field, re-designed as a frozen dataclass pytree so that hot-tunable
parameters (G, dt, fracture threshold, merge time — the lil-gui sliders at
index.html:853-857) are *dynamic* jit arguments: retuning them at runtime does
not retrigger XLA compilation. Structural parameters that determine array
shapes or loop trip counts (capacity, sub_steps, event buffer sizes) are
static metadata fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# Material type codes. The reference indexes materials by string name
# ('rock' | 'metal' | 'ice', index.html:70-74); we use dense integer codes so
# material properties become gathers on the VPU.
ROCK: int = 0
METAL: int = 1
ICE: int = 2
MATERIAL_NAMES: tuple[str, ...] = ("rock", "metal", "ice")


def _static(default: Any) -> Any:
    return dataclasses.field(default=default, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Materials:
    """Material property table (reference: index.html:70-74).

    density drives the radius law r = (3m / 4 pi rho)^(1/3) (index.html:221);
    color1/color2 feed the renderer's surface ramp (index.html:171).
    """

    density: jax.Array  # [M] f32
    color1: jax.Array  # [M, 3] f32
    color2: jax.Array  # [M, 3] f32


def default_materials() -> Materials:
    """rock: density 1.0; metal: 3.0; ice: 0.5 (index.html:71-73)."""
    return Materials(
        density=jnp.array([1.0, 3.0, 0.5], dtype=jnp.float32),
        color1=jnp.array(
            [[0.4, 0.3, 0.2], [0.6, 0.6, 0.7], [0.8, 0.9, 1.0]], dtype=jnp.float32
        ),
        color2=jnp.array(
            [[0.1, 0.1, 0.1], [0.3, 0.3, 0.4], [0.1, 0.3, 0.6]], dtype=jnp.float32
        ),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimConfig:
    """All simulation parameters.

    Dynamic leaves (jit arguments, live-tunable like the reference GUI,
    index.html:847-861):
      G, softening, dt          — gravity law + step size (index.html:53-55)
      spawn_mass                — interactive spawn mass (index.html:61)
      fracture_threshold        — specific-energy fracture gate (index.html:63, 348)
      min_fragment_mass         — smallest fragment kept (index.html:64, 427)
      merge_time                — contact seconds before merging (index.html:65, 340)
      heat_decay, heat_to_glow  — thermal model (index.html:67-68, 228)
      restitution               — normal bounce elasticity 0.2 (index.html:328)
      friction                  — tangential impulse factor 0.5 (index.html:365)

    Static metadata (shape/trip-count determining):
      sub_steps     — physics substeps per frame (index.html:56, 877-879)
      capacity      — maxBodies; fixed SoA capacity + FIFO eviction
                      (index.html:57, 240-242)
      trail_length  — render trail history (index.html:58)
      collisions    — enable the collision/merge/fracture subsystem
      max_merges / max_fractures / max_fragments — per-substep event buffer
                      caps. max_fragments=18 bounds the reference's
                      floor(3 + rand*3*severity) with severity<=5
                      (index.html:417-418). Overflow is counted, never silent.
      match_rounds  — rounds of parallel event matching approximating the
                      reference's sequential pair sweep (index.html:301-374).
    """

    G: float = 0.5
    softening: float = 0.5
    dt: float = 0.016
    spawn_mass: float = 20.0
    fracture_threshold: float = 25.0
    min_fragment_mass: float = 0.2
    merge_time: float = 0.5
    heat_decay: float = 0.998
    heat_to_glow: float = 3.0
    restitution: float = 0.2
    friction: float = 0.5
    materials: Materials = dataclasses.field(default_factory=default_materials)

    sub_steps: int = _static(2)
    capacity: int = _static(300)
    trail_length: int = _static(80)
    collisions: bool = _static(True)
    max_merges: int = _static(16)
    max_fractures: int = _static(8)
    max_fragments: int = _static(18)
    match_rounds: int = _static(4)

    @property
    def max_births(self) -> int:
        return self.max_merges + self.max_fractures * self.max_fragments

    def replace(self, **kwargs) -> "SimConfig":
        return dataclasses.replace(self, **kwargs)


def body_radius(mass: jax.Array, mat: jax.Array, materials: Materials) -> jax.Array:
    """Radius from mass and material density (index.html:221):
    r = (3 m / (4 pi rho))^(1/3)."""
    rho = materials.density[mat]
    return jnp.cbrt(3.0 * mass / (4.0 * jnp.pi * rho))


def inverse_mass(mass: jax.Array) -> jax.Array:
    """invMass = 1/m for m > 0 else 0 (index.html:212)."""
    return jnp.where(mass > 0, 1.0 / jnp.where(mass > 0, mass, 1.0), 0.0)
