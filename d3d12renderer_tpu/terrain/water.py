"""Water surface: animated normal perturbation + depth-based shading params.

Reference: src/terrain/water.h:16 + shaders/water/water_ps.hlsl — a
normal-mapped transparent plane with depth-based color blend and refraction
of the opaque color buffer.  The path-traced build shades water as a smooth
dielectric whose normal is perturbed by two scrolling wave functions; the
raster pipeline consumes the same `water_normal` field.
"""

from __future__ import annotations

import jax.numpy as jnp

# Reference defaults (water_component, terrain/water.h).
DEEP_COLOR = (0.09, 0.27, 0.32)
SHALLOW_COLOR = (0.3, 0.73, 0.63)
TRANSITION_DEPTH = 2.5


def water_normal(x, z, time, wave_scale=0.35, wave_strength=0.06):
    """Perturbed surface normal from two scrolling directional waves."""
    p1 = x * wave_scale + time * 0.6
    p2 = z * wave_scale * 1.31 - time * 0.43
    p3 = (x + z) * wave_scale * 0.7 + time * 0.9
    dx = wave_strength * (jnp.cos(p1) + 0.5 * jnp.cos(p3))
    dz = wave_strength * (jnp.cos(p2) + 0.5 * jnp.cos(p3))
    n = jnp.stack([-dx, jnp.ones_like(dx), -dz], -1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def water_color(depth_below):
    """Depth-based blend between shallow and deep color
    (reference: water_ps.hlsl depth fade)."""
    t = jnp.clip(depth_below / TRANSITION_DEPTH, 0.0, 1.0)[..., None]
    return (jnp.asarray(SHALLOW_COLOR) * (1 - t) + jnp.asarray(DEEP_COLOR) * t)
