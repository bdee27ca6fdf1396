"""Concrete particle systems: fire, smoke, debris, boids.

Reference: src/particles/fire_particle_system.cpp (atlas animation + spline
curves), smoke_particle_system.cpp, debris_particle_system.cpp (collide vs
depth buffer -> here vs ground plane/heightfield), boid_particle_system.cpp
(mesh particles with flocking).  Each system = emit_fn + sim_fn pair for
particles.step_pool, mirroring the reference's emit/sim shader pairs generated
from .hlsli snippets (premake5.lua:86-127).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .particles import ParticlePool, create_pool, step_pool

GRAVITY = -9.81


# --------------------------------------------------------------------------
# Fire (reference: fire_particle_system — rising, atlas frame by age, curves)
# --------------------------------------------------------------------------

def make_fire_system(origin=(0.0, 0.0, 0.0), capacity=1024, emit_rate=120.0):
    origin = jnp.asarray(origin)

    def emit(key, k):
        k1, k2, k3 = jax.random.split(key, 3)
        r = jnp.sqrt(jax.random.uniform(k1, (k,))) * 0.25
        th = jax.random.uniform(k2, (k,)) * 2 * jnp.pi
        pos = origin + jnp.stack(
            [r * jnp.cos(th), jnp.zeros(k), r * jnp.sin(th)], -1)
        vel = jnp.stack([jnp.zeros(k), 1.0 + jax.random.uniform(k3, (k,)),
                         jnp.zeros(k)], -1)
        return {"position": pos, "velocity": vel,
                "lifetime": 0.8 + 0.6 * jax.random.uniform(key, (k,)),
                "intensity": jnp.ones(k)}

    def sim(pool: ParticlePool, dt):
        # Buoyant rise with swirl; intensity decays over normalized age
        # (reference fire intensity spline).
        t01 = jnp.clip(pool.age / jnp.maximum(pool.lifetime, 1e-4), 0, 1)
        swirl = jnp.stack([
            jnp.sin(pool.position[:, 2] * 6 + pool.age * 4),
            jnp.zeros_like(pool.age),
            jnp.cos(pool.position[:, 0] * 6 + pool.age * 4),
        ], -1) * 0.4
        vel = pool.velocity + (jnp.array([0.0, 1.6, 0.0]) + swirl) * dt
        return {"position": pool.position + vel * dt, "velocity": vel,
                "intensity": (1.0 - t01) ** 1.5}

    return {"create": lambda key: create_pool(capacity, key,
                                              extra={"intensity": ()}),
            "step": partial(step_pool, emit_rate=emit_rate,
                            emit_fn=emit, sim_fn=sim)}


def fire_atlas_frame(age, lifetime, num_frames=16):
    """Atlas frame index by normalized age (reference: fire atlas anim)."""
    t01 = jnp.clip(age / jnp.maximum(lifetime, 1e-4), 0.0, 0.999)
    return (t01 * num_frames).astype(jnp.int32)


# --------------------------------------------------------------------------
# Smoke (reference: smoke_particle_system — slow rise, growth, fade)
# --------------------------------------------------------------------------

def make_smoke_system(origin=(0.0, 0.0, 0.0), capacity=1024, emit_rate=40.0,
                      wind=(0.4, 0.0, 0.0)):
    origin = jnp.asarray(origin)
    wind = jnp.asarray(wind)

    def emit(key, k):
        k1, k2 = jax.random.split(key)
        pos = origin + 0.1 * jax.random.normal(k1, (k, 3))
        vel = jnp.array([0.0, 0.8, 0.0]) + 0.15 * jax.random.normal(k2, (k, 3))
        return {"position": pos, "velocity": vel,
                "lifetime": 2.5 + jax.random.uniform(key, (k,)),
                "size": jnp.full((k,), 0.2)}

    def sim(pool, dt):
        t01 = jnp.clip(pool.age / jnp.maximum(pool.lifetime, 1e-4), 0, 1)
        vel = pool.velocity * (1 - 0.5 * dt) + wind * dt
        return {"position": pool.position + vel * dt, "velocity": vel,
                "size": 0.2 + 0.8 * t01}

    return {"create": lambda key: create_pool(capacity, key, extra={"size": ()}),
            "step": partial(step_pool, emit_rate=emit_rate,
                            emit_fn=emit, sim_fn=sim)}


# --------------------------------------------------------------------------
# Debris (reference: debris_particle_system — ballistic, collides with the
# scene; the reference bounces off the depth buffer, we bounce off ground)
# --------------------------------------------------------------------------

def make_debris_system(origin=(0.0, 1.0, 0.0), capacity=512, emit_rate=0.0,
                       ground_height=0.0, restitution=0.4):
    origin = jnp.asarray(origin)

    def emit(key, k):
        k1, k2 = jax.random.split(key)
        d = jax.random.normal(k1, (k, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d.at[:, 1].set(jnp.abs(d[:, 1]) + 0.5)
        speed = 3.0 + 3.0 * jax.random.uniform(k2, (k,))
        return {"position": jnp.broadcast_to(origin, (k, 3)),
                "velocity": d * speed[:, None],
                "lifetime": jnp.full((k,), 4.0)}

    def sim(pool, dt):
        vel = pool.velocity + jnp.array([0.0, GRAVITY, 0.0]) * dt
        pos = pool.position + vel * dt
        below = pos[:, 1] < ground_height
        vel = jnp.where(
            below[:, None],
            vel * jnp.array([0.7, -restitution, 0.7]),
            vel,
        )
        pos = pos.at[:, 1].set(jnp.maximum(pos[:, 1], ground_height))
        return {"position": pos, "velocity": vel}

    return {"create": lambda key: create_pool(capacity, key),
            "step": partial(step_pool, emit_rate=emit_rate,
                            emit_fn=emit, sim_fn=sim)}


# --------------------------------------------------------------------------
# Boids (reference: boid_particle_system — mesh particles with flocking)
# --------------------------------------------------------------------------

def make_boid_system(center=(0.0, 5.0, 0.0), capacity=256, emit_rate=60.0,
                     neighbor_radius=2.0, max_speed=4.0):
    center = jnp.asarray(center)

    def emit(key, k):
        k1, k2 = jax.random.split(key)
        return {"position": center + jax.random.normal(k1, (k, 3)),
                "velocity": jax.random.normal(k2, (k, 3)),
                "lifetime": jnp.full((k,), 1e9)}

    def sim(pool, dt):
        p = pool.position
        v = pool.velocity
        alive = pool.alive
        diff = p[None, :, :] - p[:, None, :]               # (N,N,3) i->j
        dist = jnp.linalg.norm(diff + 1e-6, axis=-1)
        near = (dist < neighbor_radius) & alive[None, :] & alive[:, None]
        near = near & ~jnp.eye(p.shape[0], dtype=bool)
        cnt = jnp.maximum(jnp.sum(near, -1, keepdims=True), 1)

        cohesion = jnp.sum(jnp.where(near[..., None], diff, 0.0), 1) / cnt
        separation = -jnp.sum(
            jnp.where(near[..., None], diff / (dist * dist + 0.1)[..., None], 0.0), 1
        )
        alignment = jnp.sum(jnp.where(near[..., None], v[None], 0.0), 1) / cnt - v
        home = center - p

        acc = 0.8 * cohesion + 2.0 * separation + 0.5 * alignment + 0.3 * home
        v = v + acc * dt
        speed = jnp.linalg.norm(v + 1e-9, axis=-1, keepdims=True)
        v = jnp.where(speed > max_speed, v / speed * max_speed, v)
        return {"position": p + v * dt, "velocity": v}

    return {"create": lambda key: create_pool(capacity, key),
            "step": partial(step_pool, emit_rate=emit_rate,
                            emit_fn=emit, sim_fn=sim)}
