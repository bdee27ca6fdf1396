"""Contact generation: world-space collider poses + static pair tables -> ContactTable.

Replaces the reference's broadphase (sort-and-prune, src/physics/collision_broad.cpp:297)
+ narrowphase dispatch (src/physics/collision_narrow.cpp:2328): candidate pairs are
enumerated at scene-compile time, so at runtime every pair bucket runs one fixed-shape
vectorized kernel and produces masked manifolds.  The mask IS the broadphase result.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as m
from . import gjk as gjk_mod
from . import narrow
from .types import (
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_CYLINDER,
    SHAPE_HULL,
    SHAPE_SPHERE,
    BodyState,
    ContactBucket,
    SceneArchetype,
)
from .narrow import ContactTable


def collider_world_poses(arch: SceneArchetype, state: BodyState):
    """World pose of every collider given COG body state.

    body render position = cog_pos - rot * local_cog (reference:
    src/physics/rigid_body.cpp:141); collider world = render pose ∘ local pose.
    """
    body = arch.col_body
    # Static world colliders don't exist in col_body (planes are separate), so all
    # col_body entries index real bodies; but guard with clip for padded slots.
    b = jnp.clip(body, 0, state.pos.shape[-2] - 1)
    bpos = state.pos[..., b, :]
    brot = state.rot[..., b, :]
    cog = arch.local_cog[b]
    wpos = bpos + m.quat_rotate(brot, arch.col_local_pos - cog)
    wrot = m.quat_mul(brot, arch.col_local_rot)
    return wpos, wrot


def _capsule_endpoints(wpos, wrot, half_len):
    axis = m.quat_rotate(wrot, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), wpos.shape))
    return wpos - axis * half_len[..., None], wpos + axis * half_len[..., None]


def _collider_vs_local_plane(arch: SceneArchetype, ci, cpos, crot, n, off,
                             segments):
    """Per-row manifold of collider ci against a per-row plane (n, off) —
    shared by static planes and the heightfield tangent-plane path.

    `segments` are static (shape_type, start, end) runs (rows pre-sorted by
    type at build time), so each segment compiles ONLY its own kernel."""
    pts_parts, dep_parts, msk_parts = [], [], []
    for (stype, s, e) in segments:
        ci_s = ci[s:e]
        cpos_s = cpos[..., s:e, :]
        crot_s = crot[..., s:e, :]
        n_s = n[..., s:e, :]
        off_s = off[..., s:e]
        size = arch.col_size[ci_s]

        if stype == SHAPE_SPHERE:
            p, d, k = narrow.sphere_vs_plane(cpos_s, size[..., 0], n_s, off_s)
            p, d, k = _pad4(p), _pad4d(d), _pad4m(k)
        elif stype == SHAPE_CAPSULE:
            p0, p1 = _capsule_endpoints(cpos_s, crot_s, size[..., 1])
            p, d, k = narrow.capsule_vs_plane(p0, p1, size[..., 0], n_s, off_s)
            p, d, k = _pad4(p), _pad4d(d), _pad4m(k)
        elif stype == SHAPE_BOX:
            p, d, k = narrow.box_vs_plane(cpos_s, crot_s, size, n_s, off_s)
        elif stype == SHAPE_CYLINDER:
            p, d, k = narrow.cylinder_vs_plane(
                cpos_s, crot_s, size[..., 0], size[..., 1], n_s, off_s)
        elif stype == SHAPE_HULL:
            hv = arch.col_hull_verts[ci_s]
            hm = arch.col_hull_mask[ci_s]
            wverts = cpos_s[..., None, :] + m.quat_rotate(
                crot_s[..., None, :], hv)
            p, d, k = narrow.hull_vs_plane(wverts, hm, n_s, off_s)
            k = k & jnp.any(hm, -1)[..., None]
        else:
            raise NotImplementedError(f"plane narrowphase for type {stype}")
        pts_parts.append(p)
        dep_parts.append(d)
        msk_parts.append(k)

    pts = jnp.concatenate(pts_parts, axis=-3)
    dep = jnp.concatenate(dep_parts, axis=-2)
    msk = jnp.concatenate(msk_parts, axis=-2)
    return pts, dep, msk


def _vs_plane_manifolds(arch: SceneArchetype, wpos, wrot):
    """Manifolds for every (dynamic collider, plane) candidate row."""
    ci = arch.vs_plane_collider
    pi = arch.vs_plane_plane
    cpos = wpos[..., ci, :]
    crot = wrot[..., ci, :]
    n = jnp.broadcast_to(arch.plane_normal[pi], cpos.shape)
    off = arch.plane_offset[pi]

    pts, dep, msk = _collider_vs_local_plane(arch, ci, cpos, crot, n, off,
                                             arch.vs_plane_segments)

    friction, restitution = narrow.combine_materials(
        arch.col_friction[ci], arch.plane_friction[pi],
        arch.col_restitution[ci], arch.plane_restitution[pi],
    )
    msk = msk & arch.vs_plane_valid[..., :, None]
    return ContactTable(
        body_a=jnp.broadcast_to(
            jnp.full_like(arch.vs_plane_body, arch.world_body), arch.vs_plane_body.shape
        ),
        body_b=arch.vs_plane_body,
        normal=n,
        point=pts,
        depth=dep,
        pmask=msk,
        friction=jnp.broadcast_to(friction, dep.shape[:-1]),
        restitution=jnp.broadcast_to(restitution, dep.shape[:-1]),
        active=jnp.any(msk, axis=-1),
    )


_BOX_SIGNS = np.array([
    [sx, sy, sz]
    for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)
], np.float32)


def _vs_terrain_manifolds(arch: SceneArchetype, wpos, wrot):
    """Collider vs heightfield.

    Default path: sample the terrain under the collider and collide against
    the local bilinear tangent plane (exact for smooth terrain).  With
    `arch.terrain_tri_exact`, box and hull rows instead run the min-max mip
    descent + vertex-vs-triangle narrowphase (physics/heightmap_collision.py
    — reference: physics/heightmap_collision.cpp:509), which handles cliffs
    and sharp features."""
    from ..terrain.heightmap import sample_height_bilinear

    ci = arch.vs_terrain_collider
    ti = arch.vs_terrain_terrain
    cpos = wpos[..., ci, :]
    crot = wrot[..., ci, :]

    heights = arch.terrain_height[ti]          # (Q2, R, R)
    origin = arch.terrain_origin[ti]           # (Q2, 3)
    cell = arch.terrain_cell[ti]

    def sample_one(h, o, cl, p):
        return sample_height_bilinear(h, o, cl, p[0], p[2])

    hgt, n = jax.vmap(sample_one)(heights, origin, cell, cpos)
    # Local tangent plane through the surface point under the collider.
    surf = jnp.stack([cpos[..., 0], hgt, cpos[..., 2]], -1)
    off = jnp.sum(n * surf, -1)

    pts, dep, msk = _collider_vs_local_plane(arch, ci, cpos, crot, n, off,
                                             arch.vs_terrain_segments)

    if arch.terrain_tri_exact:
        from .gjk import make_shape_ref
        from .heightmap_collision import (
            build_minmax_mips, convex_vs_terrain_triangles,
        )
        levels = jax.vmap(build_minmax_mips)(arch.terrain_height)

        def tri_rows(ci_s, ti_s, verts, vmask, col_ref):
            def one(ti_r, v, vm, ref):
                lev = [(l[ti_r], g[ti_r]) for (l, g) in levels]
                return convex_vs_terrain_triangles(
                    arch.terrain_height[ti_r], lev,
                    arch.terrain_origin[ti_r], arch.terrain_cell[ti_r],
                    v, vm, ref)
            return jax.vmap(one)(ti_s, verts, vmask, col_ref)

        for (stype, s, e) in arch.vs_terrain_segments:
            if stype == SHAPE_BOX:
                size = arch.col_size[ci[s:e]]
                signs = jnp.asarray(_BOX_SIGNS)
                verts = cpos[s:e, None, :] + m.quat_rotate(
                    crot[s:e, None, :], signs[None] * size[:, None, :])
                vmask = jnp.ones(verts.shape[:-1], bool)
            elif stype == SHAPE_HULL:
                verts = cpos[s:e, None, :] + m.quat_rotate(
                    crot[s:e, None, :], arch.col_hull_verts[ci[s:e]])
                vmask = arch.col_hull_mask[ci[s:e]]
            else:
                continue
            col_ref = make_shape_ref(
                arch.col_type[ci[s:e]], arch.col_size[ci[s:e]],
                cpos[s:e], crot[s:e],
                hull_verts=arch.col_hull_verts[ci[s:e]],
                hull_mask=arch.col_hull_mask[ci[s:e]])
            tp, td, tm, tn, tov = tri_rows(ci[s:e], ti[s:e], verts, vmask,
                                           col_ref)
            # Mip-descent overflow means candidate cells were dropped (the
            # collider AABB spans more than MIP_CANDIDATES cells at a level);
            # those rows keep the bilinear tangent-plane manifold instead of
            # a silently incomplete triangle set.
            ok = tov == 0
            pts = pts.at[s:e].set(jnp.where(ok[:, None, None], tp, pts[s:e]))
            dep = dep.at[s:e].set(jnp.where(ok[:, None], td, dep[s:e]))
            msk = msk.at[s:e].set(jnp.where(ok[:, None], tm, msk[s:e]))
            n = n.at[s:e].set(jnp.where(ok[:, None], tn, n[s:e]))

    friction, restitution = narrow.combine_materials(
        arch.col_friction[ci], arch.terrain_friction[ti],
        arch.col_restitution[ci], arch.terrain_restitution[ti],
    )
    msk = msk & arch.vs_terrain_valid[..., :, None]
    return ContactTable(
        body_a=jnp.full_like(arch.vs_terrain_body, arch.world_body),
        body_b=arch.vs_terrain_body,
        normal=n,
        point=pts,
        depth=dep,
        pmask=msk,
        friction=jnp.broadcast_to(friction, dep.shape[:-1]),
        restitution=jnp.broadcast_to(restitution, dep.shape[:-1]),
        active=jnp.any(msk, axis=-1),
    )


def _pad4(p1):  # (...,K,3) -> (...,4,3)
    k = p1.shape[-2]
    if k == 4:
        return p1
    pad = jnp.zeros(p1.shape[:-2] + (4 - k, 3), p1.dtype)
    return jnp.concatenate([p1, pad], axis=-2)


def _pad4d(d):  # (...,K) -> (...,4)
    k = d.shape[-1]
    if k == 4:
        return d
    return jnp.concatenate([d, jnp.zeros(d.shape[:-1] + (4 - k,), d.dtype)], axis=-1)


def _pad4m(mk):
    k = mk.shape[-1]
    if k == 4:
        return mk
    return jnp.concatenate([mk, jnp.zeros(mk.shape[:-1] + (4 - k,), bool)], axis=-1)


def pair_narrow_dispatch(arch: SceneArchetype, ia, ib, ta, tb, pa, ra, pb, rb):
    """Narrowphase for collider-pair rows of one static (type_a, type_b) combo.

    `ia`/`ib` may be static bucket tables or runtime broadphase candidates
    (physics/broadphase.py); `ta`/`tb` are static ints with ta <= tb.
    Returns padded 4-point manifolds (normal, pts4, dep4, msk4).
    Reference pair matrix: src/physics/collision_narrow.cpp:374-1558.
    """
    sa, sb = arch.col_size[ia], arch.col_size[ib]

    if ta == SHAPE_SPHERE and tb == SHAPE_SPHERE:
        normal, pts, dep, msk = narrow.sphere_vs_sphere(pa, sa[..., 0], pb, sb[..., 0])
    elif ta == SHAPE_SPHERE and tb == SHAPE_CAPSULE:
        b0, b1 = _capsule_endpoints(pb, rb, sb[..., 1])
        normal, pts, dep, msk = narrow.sphere_vs_capsule(pa, sa[..., 0], b0, b1, sb[..., 0])
    elif ta == SHAPE_CAPSULE and tb == SHAPE_CAPSULE:
        a0, a1 = _capsule_endpoints(pa, ra, sa[..., 1])
        b0, b1 = _capsule_endpoints(pb, rb, sb[..., 1])
        normal, pts, dep, msk = narrow.capsule_vs_capsule(a0, a1, sa[..., 0], b0, b1, sb[..., 0])
    elif ta == SHAPE_SPHERE and tb == SHAPE_BOX:
        normal, pts, dep, msk = narrow.sphere_vs_box(pa, sa[..., 0], pb, rb, sb)
    elif ta == SHAPE_CAPSULE and tb == SHAPE_BOX:
        a0, a1 = _capsule_endpoints(pa, ra, sa[..., 1])
        normal, pts, dep, msk = narrow.capsule_vs_box(a0, a1, sa[..., 0], pb, rb, sb)
    elif ta == SHAPE_BOX and tb == SHAPE_BOX:
        normal, pts, dep, msk = narrow.box_vs_box(pa, ra, sa, pb, rb, sb)
    elif SHAPE_HULL in (ta, tb) or SHAPE_CYLINDER in (ta, tb):
        # Generic convex pairs (anything involving hulls or cylinders) go
        # through the margin-aware GJK/EPA kernel (gjk.py; reference:
        # collision_gjk.cpp / collision_epa.cpp).
        a_ref = gjk_mod.make_shape_ref(
            jnp.full_like(ia, ta), sa, pa, ra,
            arch.col_hull_verts[ia], arch.col_hull_mask[ia],
        )
        b_ref = gjk_mod.make_shape_ref(
            jnp.full_like(ib, tb), sb, pb, rb,
            arch.col_hull_verts[ib], arch.col_hull_mask[ib],
        )
        normal, pts, dep, msk = gjk_mod.gjk_epa_contact(a_ref, b_ref)
    else:
        raise NotImplementedError(
            f"narrowphase pair ({ta},{tb}) not implemented yet"
        )

    return normal, _pad4(pts), _pad4d(dep), _pad4m(msk)


def _bucket_manifolds(arch: SceneArchetype, bucket: ContactBucket, wpos, wrot):
    ia, ib = bucket.collider_a, bucket.collider_b
    pa, ra = wpos[..., ia, :], wrot[..., ia, :]
    pb, rb = wpos[..., ib, :], wrot[..., ib, :]
    normal, pts4, dep4, msk4 = pair_narrow_dispatch(
        arch, ia, ib, bucket.type_a, bucket.type_b, pa, ra, pb, rb)
    msk4 = msk4 & bucket.valid[..., :, None]

    friction, restitution = narrow.combine_materials(
        arch.col_friction[ia], arch.col_friction[ib],
        arch.col_restitution[ia], arch.col_restitution[ib],
    )
    shape = dep4.shape[:-1]
    return ContactTable(
        body_a=bucket.body_a,
        body_b=bucket.body_b,
        normal=normal,
        point=pts4,
        depth=dep4,
        pmask=msk4,
        friction=jnp.broadcast_to(friction, shape),
        restitution=jnp.broadcast_to(restitution, shape),
        active=jnp.any(msk4, axis=-1),
    )


def _concat_tables(tables) -> ContactTable:
    def cat(attr, axis):
        return jnp.concatenate([getattr(t, attr) for t in tables], axis=axis)

    return ContactTable(
        body_a=cat("body_a", -1),
        body_b=cat("body_b", -1),
        normal=cat("normal", -2),
        point=cat("point", -3),
        depth=cat("depth", -2),
        pmask=cat("pmask", -2),
        friction=cat("friction", -1),
        restitution=cat("restitution", -1),
        active=cat("active", -1),
    )


def generate_contacts(arch: SceneArchetype, state: BodyState) -> ContactTable:
    """Full contact table: plane rows first, then each pair bucket, in the static
    order the builder used for global constraint coloring."""
    wpos, wrot = collider_world_poses(arch, state)
    tables = []
    if arch.vs_plane_collider.shape[0] > 0:
        tables.append(_vs_plane_manifolds(arch, wpos, wrot))
    if arch.vs_terrain_collider.shape[0] > 0:
        tables.append(_vs_terrain_manifolds(arch, wpos, wrot))
    for bucket in arch.contact_buckets:
        tables.append(_bucket_manifolds(arch, bucket, wpos, wrot))
    if arch.sap_neighbors > 0:
        from . import broadphase
        tables.append(broadphase.sap_manifolds(arch, wpos, wrot))
    if not tables:
        z = jnp.zeros((0,), jnp.int32)
        zf = jnp.zeros((0,), jnp.float32)
        return ContactTable(
            body_a=z, body_b=z,
            normal=jnp.zeros((0, 3)), point=jnp.zeros((0, 4, 3)),
            depth=jnp.zeros((0, 4)), pmask=jnp.zeros((0, 4), bool),
            friction=zf, restitution=zf, active=jnp.zeros((0,), bool),
        )
    if len(tables) == 1:
        return tables[0]
    return _concat_tables(tables)
