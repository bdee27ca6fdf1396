"""Procedural heightmap generation: fBm value noise with domain warping.

Reference: src/terrain/terrain.cpp:465 (CPU) / :571 (GPU compute) generation —
octaved noise with domain warp, amplitude/scale controls.  Here generation is
one jitted JAX function producing the full height grid on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hash2(ix, iy, seed):
    """Integer lattice hash -> [0,1) float (uint32 arithmetic)."""
    x = ix.astype(jnp.uint32)
    y = iy.astype(jnp.uint32)
    h = (x * jnp.uint32(374761393) + y * jnp.uint32(668265263)
         + jnp.uint32(seed) * jnp.uint32(2654435761))
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


def _value_noise(x, y, seed):
    """Smooth value noise on a unit lattice."""
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - ix
    fy = y - iy
    # Quintic smoothstep (Perlin's fade).
    ux = fx * fx * fx * (fx * (fx * 6 - 15) + 10)
    uy = fy * fy * fy * (fy * (fy * 6 - 15) + 10)
    v00 = _hash2(ix, iy, seed)
    v10 = _hash2(ix + 1, iy, seed)
    v01 = _hash2(ix, iy + 1, seed)
    v11 = _hash2(ix + 1, iy + 1, seed)
    return (
        v00 * (1 - ux) * (1 - uy) + v10 * ux * (1 - uy)
        + v01 * (1 - ux) * uy + v11 * ux * uy
    )


def fbm(x, y, octaves=6, lacunarity=2.0, gain=0.5, seed=1):
    """Fractional Brownian motion (reference: terrain.cpp fbm octaves)."""
    amp = 1.0
    freq = 1.0
    total = jnp.zeros_like(x)
    norm = 0.0
    for o in range(octaves):
        total = total + amp * _value_noise(x * freq, y * freq, seed + o)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm


@partial(jax.jit, static_argnames=("resolution", "octaves"))
def generate_heightmap(
    resolution: int = 128,
    world_size: float = 64.0,
    amplitude: float = 8.0,
    noise_scale: float = 0.05,
    warp_strength: float = 1.5,
    octaves: int = 6,
    seed: int = 1,
):
    """(R, R) heights.  Domain-warped fBm (reference: terrain.cpp:465-520)."""
    coords = jnp.arange(resolution, dtype=jnp.float32) / (resolution - 1) * world_size
    gx, gz = jnp.meshgrid(coords, coords, indexing="ij")
    x = gx * noise_scale
    z = gz * noise_scale
    # Domain warp: offset sample coords by low-frequency noise.
    wx = fbm(x + 13.7, z + 7.1, octaves=3, seed=seed + 100)
    wz = fbm(x - 5.3, z + 19.4, octaves=3, seed=seed + 200)
    h = fbm(x + warp_strength * wx, z + warp_strength * wz,
            octaves=octaves, seed=seed)
    return h * amplitude


def heightmap_normals(heights, cell_size):
    """Per-cell surface normals from central differences."""
    dhdx = jnp.gradient(heights, axis=0) / cell_size
    dhdz = jnp.gradient(heights, axis=1) / cell_size
    n = jnp.stack([-dhdx, jnp.ones_like(heights), -dhdz], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def heightmap_mesh(heights: np.ndarray, origin, cell_size: float):
    """Triangulate a heightmap into a render MeshData (reference terrain chunk
    meshes, shaders/terrain/terrain_vs.hlsl vertex generation)."""
    from ..render.mesh import MeshData

    h = np.asarray(heights)
    r0, r1 = h.shape
    xs = origin[0] + np.arange(r0) * cell_size
    zs = origin[2] + np.arange(r1) * cell_size
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    pos = np.stack([gx, origin[1] + h, gz], axis=-1).reshape(-1, 3)

    n = np.asarray(heightmap_normals(jnp.asarray(h), cell_size)).reshape(-1, 3)
    uv = np.stack(np.meshgrid(np.linspace(0, 1, r0), np.linspace(0, 1, r1),
                              indexing="ij"), -1).reshape(-1, 2)

    idx = []
    for i in range(r0 - 1):
        for j in range(r1 - 1):
            a = i * r1 + j
            b = a + r1
            idx.append([a, b, a + 1])
            idx.append([a + 1, b, b + 1])
    return MeshData(pos.astype(np.float32), n.astype(np.float32),
                    uv.astype(np.float32), np.array(idx, np.int32))


def sample_height_bilinear(heights, origin, cell_size, x, z):
    """Bilinear height + surface normal at world (x, z).

    heights (R0, R1); x/z any shape.  Points outside clamp to the border."""
    u = (x - origin[0]) / cell_size
    v = (z - origin[2]) / cell_size
    r0, r1 = heights.shape[-2], heights.shape[-1]
    u = jnp.clip(u, 0.0, r0 - 1.001)
    v = jnp.clip(v, 0.0, r1 - 1.001)
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    fu = u - iu
    fv = v - iv
    h00 = heights[..., iu, iv]
    h10 = heights[..., iu + 1, iv]
    h01 = heights[..., iu, iv + 1]
    h11 = heights[..., iu + 1, iv + 1]
    h = (h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
         + h01 * (1 - fu) * fv + h11 * fu * fv)
    # Analytic bilinear gradient.
    dhdu = (h10 - h00) * (1 - fv) + (h11 - h01) * fv
    dhdv = (h01 - h00) * (1 - fu) + (h11 - h10) * fu
    n = jnp.stack([-dhdu / cell_size, jnp.ones_like(h), -dhdv / cell_size], -1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return origin[1] + h, n
