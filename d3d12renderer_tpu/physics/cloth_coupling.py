"""Cloth <-> rigid-body coupling.

BASELINE.json config 3: cloth grids colliding with rigid spheres and
capsules.  The reference's cloth is standalone (no collision,
src/physics/cloth.cpp); this extension projects cloth particles out of the
scene's sphere/capsule colliders at their CURRENT simulated poses — one-way
coupling (rigid -> cloth), the standard game-engine cloth model.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp

from ..core import maths as m
from .cloth import ClothParams, ClothState, collide_capsules, collide_spheres, simulate
from .collide import collider_world_poses
from .types import SHAPE_CAPSULE, SHAPE_SPHERE, BodyState, SceneArchetype


def make_rigid_collide_fn(arch: SceneArchetype, state: BodyState,
                          margin: float = 0.0):
    """Position-projection collide_fn for cloth.simulate built from the
    scene's sphere and capsule colliders at their current poses.

    Collider sets are static (compile-time) — only poses vary per call."""
    wpos, wrot = collider_world_poses(arch, state)
    import numpy as np

    col_type = np.asarray(arch.col_type)
    sphere_idx = np.nonzero(col_type == SHAPE_SPHERE)[0]
    capsule_idx = np.nonzero(col_type == SHAPE_CAPSULE)[0]

    funcs = []
    if len(sphere_idx):
        si = jnp.asarray(sphere_idx)
        centers = wpos[si]
        radii = arch.col_size[si, 0]
        funcs.append(lambda p: collide_spheres(p, centers, radii, margin))
    if len(capsule_idx):
        ci = jnp.asarray(capsule_idx)
        cpos = wpos[ci]
        crot = wrot[ci]
        half = arch.col_size[ci, 1]
        axis = m.quat_rotate(crot, jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0]), cpos.shape))
        p0 = cpos - axis * half[:, None]
        p1 = cpos + axis * half[:, None]
        radii = arch.col_size[ci, 0]
        funcs.append(lambda p: collide_capsules(p, p0, p1, radii, margin))

    def collide(p):
        for f in funcs:
            p = f(p)
        return p

    return collide if funcs else None


def step_cloth_with_bodies(
    params: ClothParams,
    cloth_state: ClothState,
    arch: SceneArchetype,
    body_state: BodyState,
    dt: float,
    position_iterations: int = 2,
    margin: float = 0.01,
) -> ClothState:
    """One coupled step: simulate cloth against the bodies' current poses."""
    fn = make_rigid_collide_fn(arch, body_state, margin)
    return simulate(params, cloth_state, dt,
                    position_iterations=position_iterations, collide_fn=fn)
