"""Grass: per-chunk blade generation with LOD and wind animation.

Reference: src/terrain/grass.h:21-39 + shaders/grass/grass_generation_cs.hlsl
(compute generation per chunk with LOD + culling, indirect draws, wind sway in
the vertex shader).  TPU version: blade instance data is one fixed-shape
array; LOD = per-blade vertex-count class from camera distance; wind = a
time-varying bend evaluated when building blade geometry.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .placement import generate_placement_points

LOD0_SEGMENTS = 4   # reference: high-LOD blades have more segments
LOD1_SEGMENTS = 2


def generate_grass_blades(heights, origin, cell_size, world_size, key,
                          blades_per_side=128, density=0.9):
    """Blade instances on terrain: dict with position/facing/height/valid."""
    pts = generate_placement_points(
        heights, origin, cell_size, world_size, key,
        points_per_side=blades_per_side, max_slope_y=0.8, density=density,
    )
    k = jax.random.fold_in(key, 17)
    n = pts["position"].shape[0]
    return {
        "position": pts["position"],
        "facing": pts["rotation"],
        "height": 0.35 + 0.3 * jax.random.uniform(k, (n,)),
        "valid": pts["valid"],
        "count": pts["count"],
    }


def blade_lod(blade_positions, camera_position, lod_distance=20.0):
    """0 = near/high detail, 1 = far (reference: grass LOD split by distance)."""
    d = jnp.linalg.norm(blade_positions - camera_position, axis=-1)
    return (d > lod_distance).astype(jnp.int32)


def wind_offset(positions, time, strength=0.3, frequency=1.3):
    """Wind sway displacement at blade tips (reference:
    shaders/grass/grass.hlsli wind term: phase from world position)."""
    phase = positions[..., 0] * 0.5 + positions[..., 2] * 0.7
    sway = jnp.sin(time * frequency + phase) + 0.35 * jnp.sin(
        time * 2.7 * frequency + phase * 1.7
    )
    off = jnp.stack([sway * strength, jnp.zeros_like(sway),
                     0.4 * sway * strength], -1)
    return off


def blade_triangles(blades, time=0.0, segments=LOD0_SEGMENTS, width=0.03):
    """Expand blade instances into triangle soup (V, 3)/(T, 3) for rendering.

    Each blade is a tapered strip of `segments` quads bent by the wind."""
    pos = blades["position"]
    facing = blades["facing"]
    height = blades["height"]
    n = pos.shape[0]

    t = jnp.linspace(0.0, 1.0, segments + 1)               # (S+1,)
    # Blade center-line: vertical with quadratic wind bend toward the tip.
    wind = wind_offset(pos, time)                           # (N,3)
    centers = (
        pos[:, None, :]
        + jnp.stack([jnp.zeros_like(t), t, jnp.zeros_like(t)], -1)[None]
        * height[:, None, None]
        + wind[:, None, :] * (t ** 2)[None, :, None]
    )                                                       # (N,S+1,3)
    side = jnp.stack([jnp.cos(facing), jnp.zeros_like(facing),
                      jnp.sin(facing)], -1)                 # (N,3)
    half_w = width * (1.0 - t)[None, :, None]               # taper
    left = centers - side[:, None, :] * half_w
    right = centers + side[:, None, :] * half_w
    verts = jnp.stack([left, right], 2).reshape(n, -1, 3)   # (N,2*(S+1),3)

    # Triangle indices for one blade strip.
    idx = []
    for s in range(segments):
        a = 2 * s
        idx += [[a, a + 2, a + 1], [a + 1, a + 2, a + 3]]
    idx = jnp.asarray(idx, jnp.int32)                       # (2S,3)
    per = verts.shape[1]
    tri = idx[None, :, :] + (jnp.arange(n) * per)[:, None, None]
    return verts.reshape(-1, 3), tri.reshape(-1, 3)
