"""On-device diagnostics: energy, momentum, drift, event counters.

The reference has zero observability (no console.log, no timing beside the
shader clock, SURVEY.md section 5). These are the quantities the conservation
gates (BASELINE configs 2-3) are expressed in; they are computed on device and
returned from `lax.scan`, so a 10k-step drift study costs one readback.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nbx import forces
from nbx.config import SimConfig
from nbx.state import SimState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Diagnostics:
    kinetic: jax.Array  # [] f32
    potential: jax.Array  # [] f32
    momentum: jax.Array  # [3] f32
    angular_momentum: jax.Array  # [3] f32
    total_mass: jax.Array  # [] f32
    n_alive: jax.Array  # [] i32
    max_temp: jax.Array  # [] f32

    @property
    def energy(self) -> jax.Array:
        return self.kinetic + self.potential


def measure(state: SimState, cfg: SimConfig, block: int | None = None) -> Diagnostics:
    """Diagnostics over the alive bodies (dead slots have mass 0 and thus
    contribute nothing to any sum)."""
    pos, vel, mass = state.pos, state.vel, state.mass
    return Diagnostics(
        kinetic=forces.kinetic_energy(vel, mass),
        potential=forces.potential_energy(pos, mass, cfg.G, cfg.softening, block),
        momentum=jnp.sum(mass[:, None] * vel, axis=0),
        angular_momentum=jnp.sum(
            mass[:, None] * jnp.cross(pos, vel), axis=0
        ),
        total_mass=jnp.sum(mass),
        n_alive=state.n_alive,
        max_temp=jnp.max(state.temp),
    )


def measure_arrays(
    pos: jax.Array, vel: jax.Array, mass: jax.Array, G, softening,
    block: int | None = None,
) -> Diagnostics:
    """Diagnostics for raw phase-space arrays (gravity-only paths)."""
    return Diagnostics(
        kinetic=forces.kinetic_energy(vel, mass),
        potential=forces.potential_energy(pos, mass, G, softening, block),
        momentum=jnp.sum(mass[:, None] * vel, axis=0),
        angular_momentum=jnp.sum(mass[:, None] * jnp.cross(pos, vel), axis=0),
        total_mass=jnp.sum(mass),
        n_alive=jnp.sum((mass > 0).astype(jnp.int32)),
        max_temp=jnp.zeros(()),
    )


def relative_energy_drift(diags: Diagnostics) -> jax.Array:
    """max_t |E_t - E_0| / |E_0| over a stacked per-step Diagnostics log."""
    e = diags.kinetic + diags.potential
    return jnp.max(jnp.abs(e - e[0]) / jnp.abs(e[0]))


def run_logged(state, cfg, n_steps: int, path: str | None = None,
               force_impl: str = "auto"):
    """Run n_steps with per-frame on-device diagnostics returned from the
    scan (one dispatch, one readback), optionally writing JSONL — the
    observability loop the reference lacks entirely (SURVEY.md section 5).

    Returns (final_state, stacked Diagnostics [n_steps])."""
    from nbx import sim as simmod

    state, diags = simmod.run(state, cfg, n_steps, force_impl, diagnostics=measure)
    if path is not None:
        write_jsonl(path, diags)
    return state, diags


def write_jsonl(path: str, diags: Diagnostics) -> None:
    """Write a stacked per-step Diagnostics log as JSONL."""
    import json

    import numpy as np

    arrays = {
        "kinetic": np.asarray(diags.kinetic),
        "potential": np.asarray(diags.potential),
        "momentum": np.asarray(diags.momentum),
        "angular_momentum": np.asarray(diags.angular_momentum),
        "total_mass": np.asarray(diags.total_mass),
        "n_alive": np.asarray(diags.n_alive),
        "max_temp": np.asarray(diags.max_temp),
    }
    n = arrays["kinetic"].shape[0]
    with open(path, "w") as f:
        for t in range(n):
            rec = {"step": t}
            for k, v in arrays.items():
                rec[k] = v[t].tolist() if v[t].ndim else v[t].item()
            rec["energy"] = rec["kinetic"] + rec["potential"]
            f.write(json.dumps(rec) + "\n")
