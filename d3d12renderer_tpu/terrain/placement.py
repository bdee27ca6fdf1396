"""Procedural placement on terrain: jittered-grid point generation with
density masking and prefix-sum compaction.

Reference: src/terrain/proc_placement.h:13 + shaders/proc_placement/
generate_points_cs.hlsl (Poisson-ish points on terrain, slope/height masks,
prefix-sum compaction into per-mesh draw lists).  TPU version: one jitted
function; "compaction" keeps fixed shapes and returns a validity mask plus a
stable partition order (masked sort), since dynamic shapes can't jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .heightmap import sample_height_bilinear


@partial(jax.jit, static_argnames=("points_per_side",))
def generate_placement_points(
    heights,                 # (R, R)
    origin,                  # (3,)
    cell_size: float,
    world_size: float,
    key,
    points_per_side: int = 64,
    min_height: float = -1e9,
    max_height: float = 1e9,
    max_slope_y: float = 0.7,     # min surface normal y (steepness cutoff)
    density: float = 1.0,
):
    """Returns dict of (N,) arrays: position (N,3), normal (N,3), rotation
    angle (N,), scale (N,), valid (N,), order (N,) — `order` lists valid
    indices first (the fixed-shape analogue of prefix-sum compaction)."""
    n = points_per_side
    key_j, key_r, key_s, key_d = jax.random.split(key, 4)
    cell = world_size / n
    ij = jnp.stack(jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij"),
                   -1).reshape(-1, 2).astype(jnp.float32)
    jitter = jax.random.uniform(key_j, (n * n, 2))
    xz = (ij + jitter) * cell
    x = origin[0] + xz[:, 0]
    z = origin[2] + xz[:, 1]

    h, normal = sample_height_bilinear(heights, origin, cell_size, x, z)
    pos = jnp.stack([x, h, z], -1)

    keep = (
        (h >= min_height) & (h <= max_height)
        & (normal[:, 1] >= max_slope_y)
        & (jax.random.uniform(key_d, (n * n,)) < density)
    )
    order = jnp.argsort(~keep, stable=True)
    return {
        "position": pos,
        "normal": normal,
        "rotation": jax.random.uniform(key_r, (n * n,)) * 2 * jnp.pi,
        "scale": jax.random.uniform(key_s, (n * n,), minval=0.7, maxval=1.3),
        "valid": keep,
        "count": jnp.sum(keep),
        "order": order,
    }
