"""NumPy oracle: a direct transliteration of the reference physics semantics.

This is the test-only sequential implementation of the reference's physics
engine (/root/reference/index.html:204-443), written body-for-body from the
cited line semantics (SURVEY.md section 4.1): scalar float64 NumPy, dynamic
Python list of bodies, in-place sequential pair sweep — deliberately NOT
vectorized, so it preserves the reference's sweep-order visibility that the
parallel nbx implementation approximates.

Fracture randomness is injected through an `rng` callable returning U[0,1)
floats so tests can control it (the reference uses Math.random, L418-433).

One deliberate divergence: the reference's inner pair loop checks only the
*second* index against `removedIndices` (L304), so a body removed by a merge
at pair (i, j) keeps processing pairs (i, j') for j' > j within the same
sweep and can merge *again*, duplicating its mass. That is a conservation bug
in the reference (observable only on >= 3-way simultaneous first-contact);
both this oracle and nbx enforce at-most-one-event-per-body (`break` here,
greedy matching in nbx.collisions).
"""

from __future__ import annotations

import numpy as np

MATERIAL_DENSITY = {"rock": 1.0, "metal": 3.0, "ice": 0.5}
MAT_CODE = {"rock": 0, "metal": 1, "ice": 2}


class OBody:
    """Reference Body (index.html:208-231)."""

    _next_id = 0

    def __init__(self, mass, pos, vel, type="rock", temp=0.0):
        self.id = OBody._next_id
        OBody._next_id += 1
        self.mass = float(mass)
        self.inv_mass = 1.0 / mass if mass > 0 else 0.0
        self.pos = np.array(pos, dtype=np.float64)
        self.vel = np.array(vel, dtype=np.float64)
        self.acc = np.zeros(3)
        self.type = type
        self.radius = ((3.0 * mass) / (4.0 * np.pi * MATERIAL_DENSITY[type])) ** (
            1.0 / 3.0
        )
        self.temperature = float(temp)

    def update_thermal(self, heat_decay):
        self.temperature *= heat_decay  # L228
        if self.temperature < 0.1:  # L229
            self.temperature = 0.0


class OraclePhysics:
    """Reference PhysicsSystem (index.html:233-443)."""

    def __init__(
        self,
        G=0.5,
        softening=0.5,
        max_bodies=300,
        fracture_threshold=25.0,
        min_fragment_mass=0.2,
        merge_time=0.5,
        heat_decay=0.998,
        rng=None,
    ):
        self.G = G
        self.softening = softening
        self.max_bodies = max_bodies
        self.fracture_threshold = fracture_threshold
        self.min_fragment_mass = min_fragment_mass
        self.merge_time = merge_time
        self.heat_decay = heat_decay
        self.rng = rng or (lambda: np.random.default_rng(0).uniform())
        self.bodies: list[OBody] = []
        self.contact_pairs: dict[tuple, float] = {}
        self.events = dict(merges=0, fractures=0, bounces=0)

    def add_body(self, body):
        if len(self.bodies) >= self.max_bodies:  # L240
            self.bodies.pop(0)  # FIFO shift, L241
        self.bodies.append(body)
        return body

    def integrate(self, dt):
        """KDK with collisions between force eval and second kick (L247-262)."""
        half = 0.5 * dt
        for b in self.bodies:
            b.vel += b.acc * half  # L251 (old acc)
            b.pos += b.vel * dt  # L252
        self.compute_gravity()  # L255
        self.resolve_collisions(dt)  # L256
        for b in self.bodies:
            b.vel += b.acc * half  # L259 (new acc; newborns have acc=0)
            b.update_thermal(self.heat_decay)  # L260

    def compute_gravity(self):
        """Symmetric O(N^2/2) Plummer-softened direct sum (L264-291)."""
        for b in self.bodies:
            b.acc[:] = 0.0
        eps_sq = self.softening**2
        n = len(self.bodies)
        for i in range(n):
            for j in range(i + 1, n):
                a, b = self.bodies[i], self.bodies[j]
                d = b.pos - a.pos
                dist_sq = d @ d
                f = self.G / (dist_sq + eps_sq) ** 1.5  # L280
                a.acc += f * b.mass * d
                b.acc -= f * a.mass * d

    def resolve_collisions(self, dt):
        """Sequential in-place pair sweep (L293-390)."""
        new_bodies = []
        removed = set()
        frame_contacts = set()
        n = len(self.bodies)
        for i in range(n):
            if i in removed:
                continue
            for j in range(i + 1, n):
                if j in removed:
                    continue
                a, b = self.bodies[i], self.bodies[j]
                d = b.pos - a.pos
                dist_sq = d @ d
                min_dist = a.radius + b.radius
                if dist_sq >= min_dist * min_dist:  # L313
                    continue
                pair = (min(a.id, b.id), max(a.id, b.id))
                frame_contacts.add(pair)
                contact_time = self.contact_pairs.get(pair, 0.0) + dt  # L317-318
                self.contact_pairs[pair] = contact_time
                dist = np.sqrt(dist_sq)
                normal = d / dist
                rel_vel = b.vel - a.vel  # L324
                vn = rel_vel @ normal
                if vn >= 0:  # L327: only act if approaching
                    continue
                restitution = 0.2
                j_imp = -(1 + restitution) * vn / (a.inv_mass + b.inv_mass)
                mu = a.mass * b.mass / (a.mass + b.mass)
                energy = 0.5 * mu * vn * vn  # L333
                a.temperature += energy / a.mass * 0.2  # L335
                b.temperature += energy / b.mass * 0.2
                q = energy / (a.mass + b.mass)  # L338
                if contact_time > self.merge_time and q < self.fracture_threshold * 2:
                    self.merge_bodies(a, b, new_bodies)  # L340-346
                    removed.add(i)
                    removed.add(j)
                    del self.contact_pairs[pair]
                    self.events["merges"] += 1
                    break  # body i is gone; leave its j loop
                is_fracture = q > self.fracture_threshold  # L348
                corr = normal * (
                    (min_dist - dist) / (a.inv_mass + b.inv_mass) * 0.8
                )  # L350
                a.pos -= corr * a.inv_mass
                b.pos += corr * b.inv_mass
                if is_fracture and (
                    a.mass > self.min_fragment_mass or b.mass > self.min_fragment_mass
                ):  # L354
                    self.fracture_bodies(a, b, energy, new_bodies)
                    removed.add(i)
                    removed.add(j)
                    del self.contact_pairs[pair]
                    self.events["fractures"] += 1
                    break
                # bounce: normal + friction impulses (L361-369)
                impulse = normal * j_imp
                a.vel -= impulse * a.inv_mass
                b.vel += impulse * b.inv_mass
                tangent = rel_vel - normal * vn
                t_len = np.linalg.norm(tangent)
                tangent = tangent / t_len if t_len > 0 else tangent * 0.0
                jt = -(rel_vel @ tangent) * 0.5 / (a.inv_mass + b.inv_mass)
                a.vel -= tangent * jt * a.inv_mass
                b.vel += tangent * jt * b.inv_mass
                self.events["bounces"] += 1
        for pair in list(self.contact_pairs):
            if pair not in frame_contacts:  # L376-380 prune
                del self.contact_pairs[pair]
        if removed:
            self.bodies = [b for k, b in enumerate(self.bodies) if k not in removed]
        for nb in new_bodies:  # L387-389
            self.add_body(nb)

    def merge_bodies(self, a, b, out):
        """Inelastic merge (L392-409)."""
        m = a.mass + b.mass
        vel = (a.vel * a.mass + b.vel * b.mass) / m
        pos = (a.pos * a.mass + b.pos * b.mass) / m
        temp = (a.temperature * a.mass + b.temperature * b.mass) / m
        type_ = a.type if a.mass > b.mass else b.type  # L403
        out.append(OBody(m, pos, vel, type_, temp))

    def fracture_bodies(self, a, b, energy, out):
        """Stochastic breakup (L411-442)."""
        total = a.mass + b.mass
        com = (a.pos * a.mass + b.pos * b.mass) / total
        base_vel = (a.vel * a.mass + b.vel * b.mass) / total
        severity = min(energy / self.fracture_threshold, 5.0)
        n_frag = int(3 + self.rng() * 3 * severity)
        remaining = total
        for k in range(n_frag):
            if remaining < self.min_fragment_mass:  # L422 break
                break
            frag_mass = remaining * (0.3 + self.rng() * 0.4)
            if k == n_frag - 1:
                frag_mass = remaining
            if frag_mass < self.min_fragment_mass:  # L427 continue
                continue
            remaining -= frag_mass
            scatter = np.array([self.rng() - 0.5, self.rng() - 0.5, self.rng() - 0.5])
            norm = np.linalg.norm(scatter)
            scatter = scatter / norm if norm > 0 else scatter * 0.0
            pos = com + scatter * ((a.radius + b.radius) * 0.5 * self.rng())
            speed = np.sqrt(energy / total) * (0.5 + self.rng())
            vel = base_vel + scatter * speed
            temp = max(a.temperature, b.temperature) + (energy / total) * 0.1
            type_ = a.type if a.mass > b.mass else b.type
            out.append(OBody(frag_mass, pos, vel, type_, temp))

    # -- array views ------------------------------------------------------
    def pos_array(self):
        return np.array([b.pos for b in self.bodies])

    def vel_array(self):
        return np.array([b.vel for b in self.bodies])

    def mass_array(self):
        return np.array([b.mass for b in self.bodies])

    def temp_array(self):
        return np.array([b.temperature for b in self.bodies])


def from_scene(scene, **kw) -> OraclePhysics:
    """Build an oracle system from an nbx scene dict."""
    sys = OraclePhysics(**kw)
    names = {v: k for k, v in MAT_CODE.items()}
    for k in range(len(scene["mass"])):
        sys.add_body(
            OBody(
                scene["mass"][k],
                scene["pos"][k],
                scene["vel"][k],
                names[int(scene["mat"][k])],
                scene["temp"][k],
            )
        )
    return sys
