"""Trails, particles, bloom, and the composite pipeline."""

import jax.numpy as jnp
import numpy as np

from nbx import scene, sim
from nbx.config import SimConfig
from nbx.render import particles as pmod
from nbx.render import trails as tmod
from nbx.render.bloom import bloom
from nbx.render.pipeline import FrameState, render_and_advance
from nbx.render.splat import Camera


def test_trail_ring_buffer():
    t = tmod.TrailState.create(capacity=2, length=4)
    alive = jnp.array([True, True])
    for k in range(6):
        t = tmod.update(t, jnp.full((2, 3), float(k)), alive)
    assert int(t.head) == 6
    # ring holds the last 4 positions: ages 0..3 = values 5,4,3,2
    idx = (t.head - 1 - jnp.arange(4)) % 4
    vals = np.asarray(t.pos[0, idx, 0])
    np.testing.assert_allclose(vals, [5, 4, 3, 2])
    assert bool(t.valid.all())


def test_trail_dead_slot_invalidates():
    t = tmod.TrailState.create(capacity=2, length=4)
    alive = jnp.array([True, True])
    t = tmod.update(t, jnp.ones((2, 3)), alive)
    t = tmod.update(t, jnp.ones((2, 3)), jnp.array([True, False]))
    v = np.asarray(t.valid)
    assert v[0].any() and not v[1].any()  # dead body's whole history cleared


def test_by_age_head_wraparound():
    """by_age must stay correct after the ring head wraps (head=6, L=4)."""
    t = tmod.TrailState.create(capacity=1, length=4)
    for k in range(6):
        t = tmod.update(t, jnp.full((1, 3), float(k)), jnp.array([True]))
    pos_age, valid_age = tmod.by_age(t)
    np.testing.assert_allclose(np.asarray(pos_age[0, :, 0]), [5, 4, 3, 2])
    assert bool(valid_age.all())


def test_ribbon_tapers_on_screen():
    """The ribbon is GEOMETRY now: near the head it spans multiple pixels
    perpendicular to the motion, tapering toward the tail (L570-593)."""
    length, r = 24, 6.0
    t = tmod.TrailState.create(capacity=1, length=length)
    for k in range(length):
        # straight horizontal track through the view center
        t = tmod.update(
            t, jnp.asarray([[-60.0 + 5.0 * k, 0.0, 0.0]]), jnp.array([True])
        )
    img = jnp.zeros((180, 320, 3), jnp.float32)
    cam = Camera.default()
    out = np.asarray(
        tmod.splat_trails(
            img, t, jnp.asarray([r]), jnp.zeros(1), jnp.zeros(1, jnp.int32),
            jnp.asarray([[1.0, 1, 1]]), jnp.asarray([[1.0, 1, 1]]), cam,
            width=320, height=180,
        )
    ).sum(-1)
    lit_cols = np.where(out.sum(0) > 0)[0]
    assert lit_cols.size > 20  # the track crosses the screen
    # vertical spread of lit pixels per column: head end wider than tail end
    def spread(col):
        rows = np.where(out[:, col] > 0)[0]
        return rows.max() - rows.min() if rows.size else 0

    head_spread = max(spread(c) for c in lit_cols[-8:])  # newest = +x side
    tail_spread = max(spread(c) for c in lit_cols[:8])
    assert head_spread >= 3, f"head ribbon too thin: {head_spread}px"
    assert head_spread > tail_spread, (head_spread, tail_spread)


def test_particle_update_and_death():
    p = pmod.ParticleState.create(pool=16)
    p = pmod.spawn_explosions(
        p, jnp.zeros((1, 3)), jnp.array([True])
    )
    assert int(p.n_alive) == pmod.EXPLOSION_COUNT
    v0 = np.asarray(p.pos).copy()
    p = pmod.update(p, 0.5)
    moved = np.abs(np.asarray(p.pos) - v0).max()
    assert moved > 0
    for _ in range(200):
        p = pmod.update(p, 0.5)
    assert int(p.n_alive) == 0  # all decayed


def test_particle_pool_never_overflows():
    p = pmod.ParticleState.create(pool=20)
    for _ in range(5):  # 5 x 2 x 15 = 150 candidate spawns into a pool of 20
        p = pmod.spawn_explosions(p, jnp.zeros((2, 3)), jnp.array([True, True]))
    assert int(p.n_alive) <= 20
    assert p.pos.shape[0] == 20


def test_smoke_only_from_hot_bodies():
    p = pmod.ParticleState.create(pool=64, key=3)
    pos = jnp.zeros((4, 3))
    vel = jnp.zeros((4, 3))
    radius = jnp.ones(4)
    temp = jnp.array([0.0, 10.0, 500.0, 500.0])
    alive = jnp.array([True, True, True, False])
    n0 = 0
    for _ in range(30):
        p = pmod.spawn_smoke(p, pos, vel, radius, temp, alive)
    # only body 2 (hot AND alive) can emit
    assert int(p.n_alive) > 0
    assert int(p.n_alive) <= 30


def test_bloom_spreads_bright_pixels():
    img = jnp.zeros((32, 32, 3)).at[16, 16].set(10.0)
    out = np.asarray(bloom(img))
    assert out[16, 16].sum() > 10.0 * 3 * 0.9  # original kept
    assert out[16, 20].sum() > 0.01  # halo spread
    # sub-threshold pixels don't bloom
    img2 = jnp.zeros((32, 32, 3)).at[16, 16].set(0.2)
    out2 = np.asarray(bloom(img2))
    np.testing.assert_allclose(out2[16, 20], 0.0, atol=1e-7)


def test_pipeline_end_to_end():
    cfg = SimConfig(capacity=32)
    st = scene.make_state(cfg, scene.head_on_collision(), key=0)
    fr = FrameState.create(cfg.capacity, cfg.trail_length)
    cam = Camera.default()
    st, ev = sim.step(st, cfg)
    fr2, img = render_and_advance(fr, st, cfg, ev, cam, width=160, height=90)
    a = np.asarray(img)
    assert a.shape == (90, 160, 3)
    assert a.min() >= 0 and a.max() <= 1 and a.sum() > 0
    assert int(fr2.trails.head) == 1


def test_starfield_renders():
    from nbx.render.pipeline import splat_starfield, starfield_directions
    import jax.numpy as jnp

    dirs = starfield_directions(n=500)
    img = splat_starfield(jnp.zeros((90, 160, 3)), dirs, Camera.default(),
                          width=160, height=90)
    a = np.asarray(img)
    assert a.sum() > 0
    # ~6% of isotropic directions land in a 45-degree frustum
    assert (a.sum(-1) > 0).sum() > 15
    # rotation moves the field
    img2 = splat_starfield(jnp.zeros((90, 160, 3)), dirs,
                           Camera.default().orbit(d_yaw=1.0),
                           width=160, height=90)
    assert np.abs(np.asarray(img2) - a).max() > 0


def test_checkpointed_run(tmp_path):
    from nbx.interactive import Simulation

    s = Simulation(SimConfig(capacity=16), scenario="collision")
    p = str(tmp_path / "ckpt.npz")
    s.run_checkpointed(25, p, every=10)
    s2 = Simulation.load(p)
    np.testing.assert_array_equal(s2.bodies()["pos"], s.bodies()["pos"])


def test_flash_light_pool_decay_and_cull():
    """triggerFlash semantics: intensity min(0.2E, 15), x0.85/frame decay,
    culled below 0.1, slots reused (index.html:619-635)."""
    from nbx.render import lights as lmod

    li = lmod.LightState.create(pool=4)
    fpos = jnp.asarray([[1.0, 2.0, 3.0]])
    li = lmod.advance(li, fpos, jnp.asarray([100.0]), jnp.asarray([True]))
    assert float(li.intensity.max()) == 15.0  # min(0.2*100, 15) clamp
    i_prev = 15.0
    frames = 0
    no_ev = (jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.asarray([False]))
    while float(li.intensity.max()) > 0:
        li = lmod.advance(li, *no_ev)
        i_now = float(li.intensity.max())
        if i_now > 0:
            np.testing.assert_allclose(i_now, i_prev * 0.85, rtol=1e-6)
        i_prev = i_now
        frames += 1
        assert frames < 100
    assert frames > 10  # persists well past 10 frames before culling
    # pool slot is dead and reusable
    li = lmod.advance(li, fpos, jnp.asarray([10.0]), jnp.asarray([True]))
    assert float(li.intensity.max()) == 2.0


def test_flash_light_gain_reaches_nearby_bodies():
    from nbx.render import lights as lmod

    li = lmod.LightState.create(pool=4)
    li = lmod.advance(li, jnp.zeros((1, 3)), jnp.asarray([75.0]),
                      jnp.asarray([True]))
    pos = jnp.asarray([[5.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    gain = np.asarray(lmod.body_light_gain(li, pos))
    assert gain[0] > 0  # inside range 60
    assert gain[1] == 0  # beyond range


def test_merge_flash_decays_over_frames():
    """A merge's flash glows for >= 10 frames, monotonically fading
    (reference PointLight fade, index.html:629-634) — round-2 drew it for
    exactly one frame."""
    from nbx.collisions import empty_events

    cfg = SimConfig(capacity=32)
    st = scene.make_state(cfg, scene.head_on_collision(), key=0)
    fr = FrameState.create(cfg.capacity, cfg.trail_length)
    cam = Camera.default()

    import dataclasses

    ev = empty_events(cfg)
    ev = dataclasses.replace(
        ev,
        merge_pos=ev.merge_pos.at[0].set(jnp.asarray([0.0, 0.0, 0.0])),
        merge_mass=ev.merge_mass.at[0].set(60.0),  # E = 30 -> I = 6
        merge_mask=ev.merge_mask.at[0].set(True),
    )
    # frame 0: flash fires
    fr, img0 = render_and_advance(fr, st, cfg, ev, cam, width=160, height=90,
                                  use_bloom=False, n_impostors=0)
    assert float(fr.lights.intensity.max()) == 6.0

    quiet = empty_events(cfg)
    prev = float(fr.lights.intensity.max())
    series = []
    for _ in range(12):
        fr, img = render_and_advance(fr, st, cfg, quiet, cam, width=160,
                                     height=90, use_bloom=False,
                                     n_impostors=0)
        cur = float(fr.lights.intensity.max())
        series.append(cur)
        assert cur < prev
        prev = cur
    assert series[-1] > 0  # still alive after 12 frames
    # the glow is visible on screen and fades with the pool
    mid = np.asarray(img0)[38:52, 72:88].sum()
    mid_late = np.asarray(img)[38:52, 72:88].sum()
    assert mid > mid_late > 0


def test_light_glow_depth_occluded():
    """A flash glow behind an opaque surface is masked at occluded pixels
    (per-pixel z-test); in front of it, it glows (index.html:619-626 gets
    this from the WebGL z-buffer)."""
    from nbx.render import lights as lmod

    cam = Camera.default()
    h, w = 90, 160
    li = lmod.LightState.create(pool=4)
    # one light at the origin plane
    li = lmod.advance(li, jnp.zeros((1, 3)), jnp.asarray([75.0]),
                      jnp.asarray([True]))
    img0 = jnp.zeros((h, w, 3), jnp.float32)
    free = lmod.splat_light_glow(img0, li, cam, width=w, height=h)
    assert float(free.sum()) > 0.0

    # an opaque surface EVERYWHERE in front of the light kills the glow...
    near = jnp.zeros((h, w), jnp.float32)
    behind = lmod.splat_light_glow(img0, li, cam, width=w, height=h,
                                   depth=near)
    assert float(behind.sum()) == 0.0
    # ...and a surface behind it leaves the glow intact
    far = jnp.full((h, w), jnp.inf, jnp.float32)
    front = lmod.splat_light_glow(img0, li, cam, width=w, height=h,
                                  depth=far)
    np.testing.assert_allclose(np.asarray(front), np.asarray(free))


def test_big_splat_tap_depth_test():
    """The 11x11 splat tier z-tests every tap: an occluder plane covering
    only HALF the window kills exactly the occluded taps' energy."""
    from nbx.config import default_materials
    from nbx.render.splat import _splat_bodies, project

    cam = Camera.default()
    h, w = 90, 160
    mats = default_materials()
    c1, c2 = mats.color1, mats.color2
    pos = jnp.zeros((1, 3), jnp.float32)
    radius = jnp.asarray([6.0])  # big apparent radius -> 11x11 tier
    temp = jnp.zeros((1,))
    mat = jnp.zeros((1,), jnp.int32)
    alive = jnp.asarray([True])

    free = _splat_bodies(pos, radius, temp, mat, alive, c1, c2, cam,
                         width=w, height=h)
    px, py, z = project(cam, pos, w, h)
    x0 = int(np.round(float(px[0])))
    # occluder in front, covering columns right of the center
    depth = jnp.full((h, w), jnp.inf, jnp.float32)
    depth = depth.at[:, x0 + 1:].set(float(z[0]) - 1.0)
    half = _splat_bodies(pos, radius, temp, mat, alive, c1, c2, cam,
                         width=w, height=h, depth=depth)
    left = np.asarray(half[:, :x0 + 1]).sum()
    right = np.asarray(half[:, x0 + 1:]).sum()
    assert right == 0.0  # occluded side fully culled
    np.testing.assert_allclose(
        left, np.asarray(free[:, :x0 + 1]).sum(), rtol=1e-6
    )


def test_add_flashes_depth_occluded():
    """add_flashes (the event-flash splat utility) masks pixels whose
    opaque surface is in front of the flash, same rule as the persistent
    light glow."""
    from nbx.render.splat import add_flashes

    h, w = 90, 160
    cam = Camera.default()
    img0 = jnp.zeros((h, w, 3), jnp.float32)
    fpos = jnp.zeros((1, 3), jnp.float32)
    fe = jnp.asarray([100.0])
    fm = jnp.asarray([True])
    free = add_flashes(img0, fpos, fe, fm, cam, width=w, height=h)
    assert float(free.sum()) > 0.0
    near = jnp.zeros((h, w), jnp.float32)  # everything occluded
    behind = add_flashes(img0, fpos, fe, fm, cam, width=w, height=h,
                         depth=near)
    assert float(behind.sum()) == 0.0
    far = jnp.full((h, w), jnp.inf, jnp.float32)
    front = add_flashes(img0, fpos, fe, fm, cam, width=w, height=h,
                        depth=far)
    np.testing.assert_allclose(np.asarray(front), np.asarray(free))
