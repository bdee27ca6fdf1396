"""Pallas ray-triangle intersection kernel: the TPU answer to RT cores.

Pointer-chasing BVH traversal gathers ~60 values per ray-step and measures
0.01 Mrays/s on v5e (TPU gathers serialize).  The dense plane-test
formulation (render/bvh.py closest_hit_dense) lifts that to ~1.4 Mrays/s but
is HBM-bound: XLA materializes the (rays x tris) intermediates between scan
steps.  This kernel keeps everything resident in VMEM — a ray block and a
triangle chunk meet on-chip, compute t/u/v via small matmuls + VPU
elementwise, reduce to a per-ray running closest hit, and only the final
(rays,) results ever touch HBM.

Grid: (ray_blocks, tri_chunks) with the triangle axis innermost; the output
block revisits across tri chunks (standard accumulation pattern), giving a
sequential min-reduce per ray block.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024
TRI_CHUNK = 512


def _kernel(o_ref, d_ref, tmax_ref, tri_ref,
            t_ref, tri_id_ref, u_ref, v_ref):
    tc = pl.program_id(1)

    @pl.when(tc == 0)
    def _init():
        t_ref[:] = tmax_ref[:]
        tri_id_ref[:] = jnp.full_like(tri_id_ref, -1)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    o = o_ref[:]          # (RB, 3)
    d = d_ref[:]          # (RB, 3)
    tri = tri_ref[:]      # (16, C) rows: n(3), n_off, e1p(3), e1_off,
    n = tri[0:3]          #               e2p(3), e2_off, valid, pad(3)
    n_off = tri[3]
    e1p = tri[4:7]
    e1_off = tri[7]
    e2p = tri[8:11]
    e2_off = tri[11]
    valid = tri[12]       # 1.0 for real triangles

    no = jnp.dot(o, n, preferred_element_type=jnp.float32)       # (RB, C)
    nd = jnp.dot(d, n, preferred_element_type=jnp.float32)
    t = (n_off[None, :] - no) / jnp.where(jnp.abs(nd) < 1e-12, jnp.inf, nd)
    uo = jnp.dot(o, e1p, preferred_element_type=jnp.float32)
    ud = jnp.dot(d, e1p, preferred_element_type=jnp.float32)
    vo = jnp.dot(o, e2p, preferred_element_type=jnp.float32)
    vd = jnp.dot(d, e2p, preferred_element_type=jnp.float32)
    u = uo + t * ud + e1_off[None, :]
    v = vo + t * vd + e2_off[None, :]

    t_best = t_ref[:]
    ok = (
        (valid[None, :] > 0) & (t > 1e-4) & (t < t_best[:, None])
        & (u >= 0) & (v >= 0) & (u + v <= 1)
    )
    t_m = jnp.where(ok, t, jnp.inf)
    # Min + one-hot select (gathers don't lower in Mosaic).
    c = t_m.shape[1]
    t_min = jnp.min(t_m, axis=-1)                                 # (RB,)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
    is_min = t_m == t_min[:, None]
    first = jnp.min(jnp.where(is_min, cols, c), axis=-1)          # (RB,)
    sel = cols == first[:, None]
    uk = jnp.sum(jnp.where(sel, u, 0.0), -1)
    vk = jnp.sum(jnp.where(sel, v, 0.0), -1)

    better = t_min < t_best
    base = tc * c
    t_ref[:] = jnp.where(better, t_min, t_best)
    tri_id_ref[:] = jnp.where(better, base + first, tri_id_ref[:])
    u_ref[:] = jnp.where(better, uk, u_ref[:])
    v_ref[:] = jnp.where(better, vk, v_ref[:])


def pack_tris(dense) -> jnp.ndarray:
    """(16, T) row-major plane+validity table (transposed so kernel
    slices are contiguous rows and the dots need no in-kernel transpose)."""
    t = dense.n.shape[0]
    pad = (-t) % TRI_CHUNK
    tbl = jnp.concatenate([
        dense.n, dense.n_off[:, None],
        dense.e1p, dense.e1_off[:, None],
        dense.e2p, dense.e2_off[:, None],
        dense.valid.astype(jnp.float32)[:, None],
        jnp.zeros((t, 3), jnp.float32),
    ], axis=-1)
    return jnp.pad(tbl, ((0, pad), (0, 0))).T


def closest_hit_pallas(dense, origin, direction, t_max=1e30,
                       interpret=False):
    """Drop-in closest hit over a DenseTris table.

    origin/direction (R, 3); returns {t, tri, uv, hit} like closest_hit."""
    tbl = pack_tris(dense)
    t_count = tbl.shape[1]

    r = origin.shape[0]
    pad_r = (-r) % RAY_BLOCK
    o = jnp.pad(origin, ((0, pad_r), (0, 0)))
    d = jnp.pad(direction, ((0, pad_r), (0, 0)), constant_values=1.0)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tmax = jnp.pad(tmax, (0, pad_r))
    rp = o.shape[0]

    grid = (rp // RAY_BLOCK, t_count // TRI_CHUNK)

    out_shapes = (
        jax.ShapeDtypeStruct((rp,), jnp.float32),
        jax.ShapeDtypeStruct((rp,), jnp.int32),
        jax.ShapeDtypeStruct((rp,), jnp.float32),
        jax.ShapeDtypeStruct((rp,), jnp.float32),
    )
    ray_spec = pl.BlockSpec((RAY_BLOCK, 3), lambda rb, tc: (rb, 0),
                            memory_space=pltpu.VMEM)
    per_ray = pl.BlockSpec((RAY_BLOCK,), lambda rb, tc: (rb,),
                           memory_space=pltpu.VMEM)

    t, tri, u, v = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            ray_spec, ray_spec, per_ray,
            pl.BlockSpec((16, TRI_CHUNK), lambda rb, tc: (0, tc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(per_ray, per_ray, per_ray, per_ray),
        out_shape=out_shapes,
        interpret=interpret,
    )(o, d, tmax, tbl)

    t = t[:r]
    tri = tri[:r]
    uv = jnp.stack([u[:r], v[:r]], -1)
    hit = tri >= 0
    return {"t": t, "tri": tri, "uv": uv, "hit": hit}
