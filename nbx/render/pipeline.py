"""Full frame pipeline: bodies + trails + particles + event flashes.

The composition order mirrors the reference frame (additive everything, then
tonemap — the EffectComposer + bloom analog, index.html:724-732, 873-883):

    HDR = splat(bodies) + splat(trails) + splat(particles) + flashes(events)
    frame = tonemap(HDR)

`FrameState` carries the renderer's persistent device state (trail ring
buffer + particle pool). `render_and_advance` consumes one simulation step's
output (state + events) and returns (new FrameState, u8-ready frame) — the
decoupled replacement for the reference's physics->visuals calls.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from nbx.render import particles as particles_mod
from nbx.render import trails as trails_mod
from nbx.render.colormap import tonemap
from nbx.render.splat import Camera, add_flashes, splat_bodies_hdr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameState:
    trails: trails_mod.TrailState
    particles: particles_mod.ParticleState

    @staticmethod
    def create(capacity: int, trail_length: int = 80,
               pool: int = particles_mod.POOL_SIZE, key: int = 0) -> "FrameState":
        return FrameState(
            trails=trails_mod.TrailState.create(capacity, trail_length),
            particles=particles_mod.ParticleState.create(pool, key),
        )


@partial(jax.jit, static_argnames=("width", "height", "use_bloom"))
def render_and_advance(
    frame: FrameState,
    state,  # SimState
    cfg,  # SimConfig
    events,  # Events (stacked over substeps: leading axis S)
    cam: Camera,
    width: int = 640,
    height: int = 360,
    exposure: float = 1.5,
    use_bloom: bool = True,
):
    """One rendered frame + advanced renderer state. `events` may be a
    single-substep Events or a substep-stacked one (leaves [S, ...])."""
    radius = state.radius(cfg)
    c1, c2 = cfg.materials.color1, cfg.materials.color2

    # advance trails + particles
    trails = trails_mod.update(frame.trails, state.pos, state.alive)
    parts = particles_mod.update(frame.particles, cfg.dt)
    parts = particles_mod.spawn_smoke(
        parts, state.pos, state.vel, radius, state.temp, state.alive
    )

    # flatten substep-stacked events
    def flat(x):
        return x.reshape((-1,) + x.shape[2:]) if x.ndim >= 2 else x

    spawn_pos = flat(events.spawn_pos)
    spawn_mask = flat(events.spawn_mask)
    parts = particles_mod.spawn_explosions(parts, spawn_pos, spawn_mask)

    hdr = splat_bodies_hdr(
        state.pos, radius, state.temp, state.mat, state.alive, c1, c2, cam,
        width=width, height=height,
    )
    hdr = trails_mod.splat_trails(
        hdr, trails, radius, state.temp, state.mat, c1, c2, cam,
        width=width, height=height,
    )
    hdr = particles_mod.splat_particles(hdr, parts, cam, width=width, height=height)

    flash_pos = jnp.concatenate([flat(events.merge_pos), flat(events.fracture_pos)])
    # merge flash energy = 0.5 * merged mass (L408); fracture = impact E (L358)
    flash_e = jnp.concatenate(
        [0.5 * flat(events.merge_mass), flat(events.fracture_energy)]
    )
    flash_mask = jnp.concatenate([flat(events.merge_mask), flat(events.fracture_mask)])
    hdr = add_flashes(hdr, flash_pos, flash_e, flash_mask, cam,
                      width=width, height=height)
    if use_bloom:
        from nbx.render.bloom import bloom

        hdr = bloom(hdr)

    return FrameState(trails=trails, particles=parts), tonemap(hdr, exposure)
