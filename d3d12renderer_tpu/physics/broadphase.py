"""Runtime device-side broadphase: dense AABB overlap + top-K compaction.

Replaces the reference's sort-and-prune sweep (reference:
src/physics/collision_broad.cpp:297-447) for scenes too large for the
compile-time all-pairs bucket enumeration (physics/builder.py).  The CPU SAP's
strength is O(n log n + overlaps) on one core; on TPU the idiomatic shape is
the opposite trade: test ALL pairs' AABBs at once — a (C, C) boolean
elementwise pass is microseconds of VPU work at C=1000 — then compact each
row's overlaps into a fixed (C, K) candidate table with `lax.top_k`.  Fixed
shapes, no sorting, no data-dependent control flow; overflow (a collider
overlapping more than K others) is detected and reported, matching SURVEY §7's
"bucketed padding + overflow stat" hard-part recipe.

The candidate pairs then run the same narrowphase kernels as the static
buckets (collide.pair_narrow_dispatch), masked per shape-type combo, and the
resulting contacts are solved with the mass-splitting Jacobi mode (runtime
pair sets cannot be statically colored).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as m
from .types import (
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_CYLINDER,
    SHAPE_HULL,
    SHAPE_SPHERE,
    BodyState,
    SceneArchetype,
)
from .narrow import ContactTable


def world_aabbs(arch: SceneArchetype, wpos, wrot):
    """Per-collider world AABB (..., C, 3) min/max.

    Exact for spheres and boxes (the hot cases); conservative bound-radius
    AABBs for capsule/cylinder/hull (reference computes exact per-type AABBs,
    src/physics/bounding_volumes.cpp — the bound-radius fallback only admits
    extra candidates, never misses one)."""
    t = arch.col_type
    size = arch.col_size

    rotm = m.quat_to_mat3(wrot)                       # (..., C, 3, 3)
    box_ext = jnp.einsum("...ij,...j->...i", jnp.abs(rotm), size)
    sphere_ext = jnp.broadcast_to(size[..., :1], wpos.shape)
    bound_ext = jnp.broadcast_to(
        arch.col_bound_radius[..., :, None], wpos.shape)

    is_sphere = (t == SHAPE_SPHERE)[..., :, None]
    is_box = (t == SHAPE_BOX)[..., :, None]
    ext = jnp.where(is_sphere, sphere_ext, jnp.where(is_box, box_ext, bound_ext))
    return wpos - ext, wpos + ext


def candidate_pairs(arch: SceneArchetype, amin, amax):
    """(C, K) candidate collider-pair table from dense AABB overlap.

    Returns (j_idx, valid, overflow): row i's candidates are colliders
    j_idx[i, :] with valid mask; overflow is the per-scene count of rows whose
    true overlap count exceeded K (dropped pairs)."""
    K = arch.sap_neighbors
    C = amin.shape[-2]
    # (C, C) interval overlap on all three axes.
    lo = jnp.maximum(amin[..., :, None, :], amin[..., None, :, :])
    hi = jnp.minimum(amax[..., :, None, :], amax[..., None, :, :])
    overlap = jnp.all(lo <= hi, axis=-1)
    mask = overlap & arch.sap_collidable            # upper-triangular & groups
    counts = jnp.sum(mask, axis=-1)                  # (C,)
    # Prefer small j deterministically: score C-j for overlapping pairs.
    j_rank = jnp.arange(C, dtype=jnp.int32)
    score = jnp.where(mask, C - j_rank, 0).astype(jnp.int32)
    vals, j_idx = jax.lax.top_k(score, K)            # (C, K)
    valid = vals > 0
    overflow = jnp.sum(counts > K)
    return j_idx, valid, overflow


def sap_manifolds(arch: SceneArchetype, wpos, wrot) -> ContactTable:
    """ContactTable over the runtime candidate pairs (flattened (C*K,) rows)."""
    from . import collide  # local import to avoid a module cycle

    amin, amax = world_aabbs(arch, wpos, wrot)
    j_idx, valid, _ = candidate_pairs(arch, amin, amax)

    C, K = j_idx.shape[-2], j_idx.shape[-1]
    i_idx = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[..., :, None], j_idx.shape)
    ia = i_idx.reshape(i_idx.shape[:-2] + (C * K,))
    ib = j_idx.reshape(j_idx.shape[:-2] + (C * K,))
    valid = valid.reshape(valid.shape[:-2] + (C * K,))

    # Compact the sparse (C*K) candidate list to a fixed active budget before
    # narrowphase — most windows are empty, and every downstream stage
    # (narrow kernels, contact prep, Jacobi sweeps) is linear in row count.
    budget = min(arch.sap_max_contacts, C * K)
    P0 = C * K
    score = jnp.where(valid, P0 - jnp.arange(P0, dtype=jnp.int32), 0)
    vals, sel = jax.lax.top_k(score, budget)
    ia = jnp.take_along_axis(ia, sel, axis=-1)
    ib = jnp.take_along_axis(ib, sel, axis=-1)
    valid = vals > 0

    # Canonical shape-type order (sphere < capsule < ... as in type codes) so
    # each narrow kernel sees its (type_a <= type_b) convention.
    ta = arch.col_type[ia]
    tb = arch.col_type[ib]
    swap = ta > tb
    ia, ib = jnp.where(swap, ib, ia), jnp.where(swap, ia, ib)
    ta, tb = jnp.where(swap, tb, ta), jnp.where(swap, ta, tb)

    pa = jnp.take_along_axis(wpos, ia[..., :, None], axis=-2)
    ra = jnp.take_along_axis(wrot, ia[..., :, None], axis=-2)
    pb = jnp.take_along_axis(wpos, ib[..., :, None], axis=-2)
    rb = jnp.take_along_axis(wrot, ib[..., :, None], axis=-2)

    # One masked kernel run per shape-type combo present in the scene.
    P = ia.shape[-1]
    normal = jnp.zeros(pa.shape)
    pts4 = jnp.zeros(pa.shape[:-1] + (4, 3))
    dep4 = jnp.zeros(pa.shape[:-1] + (4,))
    msk4 = jnp.zeros(pa.shape[:-1] + (4,), bool)
    for (tta, ttb) in arch.sap_type_pairs:
        combo = (ta == tta) & (tb == ttb)
        n_c, p_c, d_c, m_c = collide.pair_narrow_dispatch(
            arch, ia, ib, tta, ttb, pa, ra, pb, rb)
        sel = combo[..., :, None]
        normal = jnp.where(sel, n_c, normal)
        pts4 = jnp.where(sel[..., None], p_c, pts4)
        dep4 = jnp.where(sel, d_c, dep4)
        msk4 = jnp.where(sel, m_c, msk4)

    msk4 = msk4 & valid[..., :, None]
    from . import narrow
    friction, restitution = narrow.combine_materials(
        arch.col_friction[ia], arch.col_friction[ib],
        arch.col_restitution[ia], arch.col_restitution[ib],
    )
    return ContactTable(
        body_a=arch.col_body[ia],
        body_b=arch.col_body[ib],
        normal=normal,
        point=pts4,
        depth=dep4,
        pmask=msk4,
        friction=jnp.broadcast_to(friction, dep4.shape[:-1]),
        restitution=jnp.broadcast_to(restitution, dep4.shape[:-1]),
        active=jnp.any(msk4, axis=-1),
    )


def overflow_count(arch: SceneArchetype, state: BodyState):
    """Diagnostic: number of colliders whose overlap set exceeded K this step."""
    from . import collide
    wpos, wrot = collide.collider_world_poses(arch, state)
    amin, amax = world_aabbs(arch, wpos, wrot)
    _, _, overflow = candidate_pairs(arch, amin, amax)
    return overflow
