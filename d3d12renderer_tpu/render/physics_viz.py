"""Render a physics scene directly from its archetype collider tables.

The reference rebuilds its TLAS from raytrace components every frame
(application.cpp:655-665); the generic equivalent here converts every
collider to a primitive mesh at its simulated world pose and builds a BVH —
usable for the locomotion env's ragdolls, stack drops, vehicles, any
SceneBuilder scene."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..physics.collide import collider_world_poses
from ..physics.types import (
    SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CYLINDER, SHAPE_HULL, SHAPE_SPHERE,
    BodyState, SceneArchetype,
)
from . import bvh as bvh_mod
from . import mesh as mesh_mod


def physics_meshes(arch: SceneArchetype, state: BodyState,
                   material_of=None, ground_material: int = 0):
    """[(MeshData, material_id)] for every collider (+ plane quads).

    material_of(collider_index) -> material id; defaults to 1 + body index
    mod 4 so adjacent bodies alternate."""
    import jax

    wpos, wrot = jax.device_get(collider_world_poses(arch, state))
    col_type = np.asarray(jax.device_get(arch.col_type))
    size = np.asarray(jax.device_get(arch.col_size))
    body = np.asarray(jax.device_get(arch.col_body))
    hull_v = np.asarray(jax.device_get(arch.col_hull_verts))
    hull_m = np.asarray(jax.device_get(arch.col_hull_mask))

    meshes = []
    for ci in range(col_type.shape[0]):
        t = int(col_type[ci])
        if t == SHAPE_SPHERE:
            geo = mesh_mod.ico_sphere(float(size[ci, 0]), 2)
        elif t == SHAPE_BOX:
            geo = mesh_mod.box(tuple(size[ci]))
        elif t == SHAPE_CAPSULE:
            geo = mesh_mod.capsule(float(size[ci, 0]), float(size[ci, 1]))
        elif t == SHAPE_CYLINDER:
            geo = mesh_mod.cylinder(float(size[ci, 0]), float(size[ci, 1]))
        elif t == SHAPE_HULL:
            pts = hull_v[ci][hull_m[ci]]
            r = float(np.linalg.norm(pts, axis=-1).max()) if len(pts) else 0.1
            geo = mesh_mod.ico_sphere(r, 1)   # hulls: bounding-sphere proxy
        else:
            continue
        geo = geo.transformed(translate=tuple(np.asarray(wpos[ci])),
                              rotate=tuple(np.asarray(wrot[ci])))
        mat = (material_of(ci) if material_of
               else 1 + int(body[ci]) % 4)
        meshes.append((geo, mat))

    plane_n = np.asarray(jax.device_get(arch.plane_normal))
    plane_off = np.asarray(jax.device_get(arch.plane_offset))
    for pi in range(plane_n.shape[0]):
        n = plane_n[pi]
        if abs(n[1]) > 0.9:   # horizontal ground plane -> big quad
            q = mesh_mod.quad(half=30.0).transformed(
                translate=(0.0, float(plane_off[pi] / max(n[1], 1e-6)), 0.0))
            meshes.append((q, ground_material))
    return meshes


def render_physics_state(arch: SceneArchetype, state: BodyState,
                         eye=(6.0, 4.0, 8.0), target=(0.0, 1.0, 0.0),
                         size: int = 256, spp: int = 8, key=None,
                         materials=None):
    """Path-trace one frame of a physics state (the eval-render leg of
    BASELINE config 5).  Returns (H, W, 3) tonemapped uint8."""
    import math

    import jax
    import jax.numpy as jnp

    from .camera import look_at
    from .pathtracer import (
        Materials, PathTracerSettings, Scene, default_sky, render,
        to_srgb_u8,
    )

    meshes = physics_meshes(arch, state)
    b = bvh_mod.build_bvh(meshes)
    if materials is None:
        materials = Materials(
            albedo=jnp.asarray([[0.55, 0.55, 0.55], [0.8, 0.3, 0.25],
                                [0.25, 0.5, 0.8], [0.85, 0.7, 0.25],
                                [0.4, 0.75, 0.35]]),
            emissive=jnp.zeros((5, 3)),
            roughness=jnp.full((5,), 0.55),
            metallic=jnp.zeros((5,)),
        )
    scene = Scene(bvh=b, materials=materials, sky=default_sky())
    cam = look_at(eye=eye, target=target, aspect=1.0,
                  v_fov=math.radians(50))
    img = render(scene, cam, size, size, PathTracerSettings(recursion_depth=2),
                 spp=spp, key=key if key is not None else jax.random.PRNGKey(0))
    return np.asarray(to_srgb_u8(img))
