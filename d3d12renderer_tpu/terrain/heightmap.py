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


def terrain_lod_chunks(heights: np.ndarray, origin, cell_size: float,
                       chunk_cells: int = 16, camera_pos=(0.0, 0.0, 0.0),
                       lod_distances=(24.0, 48.0, 96.0)):
    """Chunked terrain meshes with distance LOD and hole-free seam collapse.

    Reference: shaders/terrain/terrain_vs.hlsl — per-chunk LOD by camera
    distance; edge vertices of a finer chunk that face a coarser neighbor
    snap onto the coarser edge's piecewise-linear height, so shared edges
    are geometrically identical (watertight, no cracks).

    Returns a list of (MeshData, lod_level, (ci, cj)) per chunk."""
    from ..render.mesh import MeshData

    h = np.asarray(heights, np.float64)
    r0, r1 = h.shape
    n_ci = (r0 - 1) // chunk_cells
    n_cj = (r1 - 1) // chunk_cells
    cam = np.asarray(camera_pos, np.float64)
    max_lod = int(np.log2(chunk_cells))

    def chunk_lod(ci, cj):
        cx = origin[0] + (ci + 0.5) * chunk_cells * cell_size
        cz = origin[2] + (cj + 0.5) * chunk_cells * cell_size
        d = np.hypot(cx - cam[0], cz - cam[2])
        lod = 0
        for t in lod_distances:
            if d > t:
                lod += 1
        return min(lod, max_lod)

    lods = {(ci, cj): chunk_lod(ci, cj)
            for ci in range(n_ci) for cj in range(n_cj)}

    def edge_height(i, j, stride):
        """Height at grid (i, j) as seen by an edge of the given stride:
        piecewise-linear between the stride's samples."""
        i0 = (i // stride) * stride
        j0 = (j // stride) * stride
        fi = (i - i0) / stride
        fj = (j - j0) / stride
        if fi > 0:   # vertical edge (varying i)
            return h[i0, j] * (1 - fi) + h[min(i0 + stride, r0 - 1), j] * fi
        if fj > 0:
            return h[i, j0] * (1 - fj) + h[i, min(j0 + stride, r1 - 1)] * fj
        return h[i, j]

    chunks = []
    for (ci, cj), lod in lods.items():
        stride = 1 << lod
        i0, j0 = ci * chunk_cells, cj * chunk_cells
        gi = np.arange(i0, i0 + chunk_cells + 1, stride)
        gj = np.arange(j0, j0 + chunk_cells + 1, stride)
        hh = h[np.ix_(gi, gj)].copy()

        # Seam collapse: snap edge heights to the coarser neighbor's grid.
        def neighbor_stride(nci, ncj):
            l = lods.get((nci, ncj))
            return (1 << l) if l is not None else None

        for edge, (nci, ncj) in (("i0", (ci - 1, cj)), ("i1", (ci + 1, cj)),
                                 ("j0", (ci, cj - 1)), ("j1", (ci, cj + 1))):
            ns = neighbor_stride(nci, ncj)
            if ns is None or ns <= stride:
                continue
            if edge == "i0":
                for k, j in enumerate(gj):
                    hh[0, k] = edge_height(i0, j, ns)
            elif edge == "i1":
                for k, j in enumerate(gj):
                    hh[-1, k] = edge_height(i0 + chunk_cells, j, ns)
            elif edge == "j0":
                for k, i in enumerate(gi):
                    hh[k, 0] = edge_height(i, j0, ns)
            else:
                for k, i in enumerate(gi):
                    hh[k, -1] = edge_height(i, j0 + chunk_cells, ns)

        xs = origin[0] + gi * cell_size
        zs = origin[2] + gj * cell_size
        gx, gz = np.meshgrid(xs, zs, indexing="ij")
        pos = np.stack([gx, origin[1] + hh, gz], -1).reshape(-1, 3)
        m0, m1 = len(gi), len(gj)
        n = np.asarray(heightmap_normals(
            jnp.asarray(hh), cell_size * stride)).reshape(-1, 3)
        uv = np.stack(np.meshgrid(
            gi / (r0 - 1), gj / (r1 - 1), indexing="ij"), -1).reshape(-1, 2)
        idx = []
        for i in range(m0 - 1):
            for j in range(m1 - 1):
                a = i * m1 + j
                b = a + m1
                idx.append([a, b, a + 1])
                idx.append([a + 1, b, b + 1])
        mesh = MeshData(pos.astype(np.float32), n.astype(np.float32),
                        uv.astype(np.float32), np.asarray(idx, np.int32))
        chunks.append((mesh, lod, (ci, cj)))
    return chunks


# Splat shading (reference: tri-material PBR splatting, src/terrain/terrain.h:31
# + shaders/terrain/terrain_ps.hlsl ground/rock/mud blend by slope & height).

def splat_weights(heights, cell_size, rock_slope_start=0.1,
                  rock_slope_end=0.25, snow_height_start=0.7,
                  snow_height_end=0.9):
    """(R0, R1, 3) blend weights for (grass, rock, snow); rows sum to 1.

    Rock fades in with slope (1 - n.y), snow with normalized height on the
    remaining non-rock fraction."""
    n = heightmap_normals(heights, cell_size)
    slope = 1.0 - n[..., 1]
    rock = jnp.clip((slope - rock_slope_start)
                    / (rock_slope_end - rock_slope_start), 0.0, 1.0)
    h = heights
    h01 = (h - h.min()) / jnp.maximum(h.max() - h.min(), 1e-6)
    snow = jnp.clip((h01 - snow_height_start)
                    / (snow_height_end - snow_height_start), 0.0, 1.0)
    snow = snow * (1.0 - rock)
    grass = jnp.clip(1.0 - rock - snow, 0.0, 1.0)
    w = jnp.stack([grass, rock, snow], -1)
    return w / jnp.sum(w, -1, keepdims=True)


def shade_splat(weights, albedos):
    """Blend 3 material albedos by splat weights: (..., 3) colors."""
    albedos = jnp.asarray(albedos)          # (3, 3)
    return jnp.einsum("...k,kc->...c", weights, albedos)


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
