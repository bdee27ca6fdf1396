"""GJK + EPA narrowphase for arbitrary convex pairs, fully batched.

Reference equivalents: src/physics/collision_gjk.h:6 (support-function
templated intersection), src/physics/collision_epa.h (penetration depth and
normal from the GJK termination simplex).  The reference uses data-dependent
loops with early exits; here both algorithms run a fixed iteration budget with
masked convergence so thousands of pairs solve in lockstep on the VPU
(SURVEY.md §7 hard part 3).

Shapes are described by (type, size, hull_index) and evaluated through one
generic support function; convex hull vertex sets live in a fixed-size padded
buffer (reference hull geometry: src/physics/bounding_volumes.cpp
boundingHullGeometries).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import maths as m
from .types import (
    SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CYLINDER, SHAPE_HULL, SHAPE_SPHERE,
)

GJK_ITERATIONS = 32
EPA_ITERATIONS = 24
EPA_MAX_FACES = 4 + 2 * EPA_ITERATIONS


def support_local(shape_type, size, hull_verts, hull_mask, d):
    """Support point of the shape in its LOCAL frame for local direction d.

    shape_type (P,), size (P,3), hull_verts (P,V,3), hull_mask (P,V),
    d (P,3) (need not be normalized)."""
    dn = m.noz(d)

    # Sphere: r * dn.
    s_sphere = dn * size[..., 0:1]

    # Capsule along Y: endpoint + r*dn.
    ends = jnp.stack([jnp.zeros_like(size[..., 0]),
                      jnp.sign(d[..., 1]) * size[..., 1],
                      jnp.zeros_like(size[..., 0])], -1)
    s_capsule = ends + dn * size[..., 0:1]

    # Box: sign(d) * half.
    sgn = jnp.where(d >= 0, 1.0, -1.0)
    s_box = sgn * size

    # Cylinder along Y: rim point + cap.
    dxz = jnp.stack([d[..., 0], jnp.zeros_like(d[..., 0]), d[..., 2]], -1)
    rim = m.noz(dxz) * size[..., 0:1]
    s_cyl = rim + jnp.stack([jnp.zeros_like(d[..., 0]),
                             jnp.sign(d[..., 1]) * size[..., 1],
                             jnp.zeros_like(d[..., 0])], -1)

    # Hull: masked argmax over vertices.
    dots = jnp.sum(hull_verts * d[..., None, :], -1)
    dots = jnp.where(hull_mask, dots, -jnp.inf)
    best = jnp.argmax(dots, axis=-1)
    s_hull = jnp.take_along_axis(hull_verts, best[..., None, None], -2)[..., 0, :]

    out = s_sphere
    out = jnp.where((shape_type == SHAPE_CAPSULE)[..., None], s_capsule, out)
    out = jnp.where((shape_type == SHAPE_BOX)[..., None], s_box, out)
    out = jnp.where((shape_type == SHAPE_CYLINDER)[..., None], s_cyl, out)
    out = jnp.where((shape_type == SHAPE_HULL)[..., None], s_hull, out)
    return out


class ShapeRef(NamedTuple):
    """World-space convex shape batch.

    `size`/`hull_verts` describe the CORE (margin-shrunk) shape and `margin`
    the uniform inflation restoring the true surface — the standard GJK
    margin trick: shallow contacts resolve exactly from core DISTANCE
    (witness points + margins), EPA only handles deep core overlap."""

    shape_type: jnp.ndarray  # (P,)
    size: jnp.ndarray        # (P, 3)
    pos: jnp.ndarray         # (P, 3)
    rot: jnp.ndarray         # (P, 4)
    hull_verts: jnp.ndarray  # (P, V, 3) local-space
    hull_mask: jnp.ndarray   # (P, V)
    margin: jnp.ndarray      # (P,)


def make_shape_ref(shape_type, size, pos, rot, hull_verts=None, hull_mask=None,
                   max_margin=0.01) -> ShapeRef:
    """Build a ShapeRef from TRUE shape parameters, deriving core + margin.

    sphere/capsule: core = point/segment, margin = radius (exact).
    box/cylinder: core shrunk by delta, margin = delta.
    hull: vertices pulled delta toward the centroid, margin = delta."""
    size = jnp.asarray(size)
    shape_type = jnp.asarray(shape_type)
    p = size.shape[0]
    if hull_verts is None:
        hull_verts = jnp.zeros((p, 1, 3))
        hull_mask = jnp.zeros((p, 1), bool)

    r = size[..., 0]
    h = size[..., 1]
    min_half = jnp.min(jnp.where(size > 0, size, jnp.inf), -1)
    delta = jnp.minimum(max_margin, 0.2 * min_half)

    core = size
    margin = jnp.zeros((p,))
    # Sphere: point core.
    is_s = shape_type == SHAPE_SPHERE
    core = jnp.where(is_s[:, None], jnp.zeros_like(size), core)
    margin = jnp.where(is_s, r, margin)
    # Capsule: segment core.
    is_c = shape_type == SHAPE_CAPSULE
    core = jnp.where(is_c[:, None],
                     jnp.stack([jnp.zeros_like(r), h, jnp.zeros_like(r)], -1),
                     core)
    margin = jnp.where(is_c, r, margin)
    # Box: shrink each half extent.
    is_b = shape_type == SHAPE_BOX
    core = jnp.where(is_b[:, None], jnp.maximum(size - delta[:, None], 1e-4), core)
    margin = jnp.where(is_b, delta, margin)
    # Cylinder: shrink radius and half-height.
    is_cy = shape_type == SHAPE_CYLINDER
    cyl_core = jnp.stack([jnp.maximum(r - delta, 1e-4),
                          jnp.maximum(h - delta, 1e-4),
                          jnp.zeros_like(r)], -1)
    core = jnp.where(is_cy[:, None], cyl_core, core)
    margin = jnp.where(is_cy, delta, margin)
    # Hull: pull vertices toward the centroid.
    is_h = shape_type == SHAPE_HULL
    cnt = jnp.maximum(jnp.sum(hull_mask, -1, keepdims=True), 1)
    centroid = jnp.sum(jnp.where(hull_mask[..., None], hull_verts, 0.0), -2) / cnt
    to_c = centroid[:, None, :] - hull_verts
    dist = jnp.maximum(jnp.linalg.norm(to_c, axis=-1, keepdims=True), 1e-9)
    shrunk = hull_verts + to_c / dist * jnp.minimum(delta[:, None, None], dist * 0.5)
    hull_verts = jnp.where(is_h[:, None, None], shrunk, hull_verts)
    margin = jnp.where(is_h, delta, margin)

    return ShapeRef(shape_type=shape_type, size=core, pos=jnp.asarray(pos),
                    rot=jnp.asarray(rot), hull_verts=hull_verts,
                    hull_mask=hull_mask, margin=margin)


def support_world(s: ShapeRef, d):
    dl = m.quat_inv_rotate(s.rot, d)
    p = support_local(s.shape_type, s.size, s.hull_verts, s.hull_mask, dl)
    return s.pos + m.quat_rotate(s.rot, p)


def minkowski_support(a: ShapeRef, b: ShapeRef, d):
    """Support of A - B in direction d (plus witness points)."""
    pa = support_world(a, d)
    pb = support_world(b, -d)
    return pa - pb, pa, pb


def _seg_bary(p, q):
    """Closest point to origin on segment pq: (closest, t) with weights (1-t, t)."""
    pq = q - p
    t = jnp.clip(
        -jnp.sum(p * pq, -1) / jnp.maximum(jnp.sum(pq * pq, -1), 1e-14),
        0.0, 1.0,
    )
    return p + pq * t[:, None], t


def _tri_bary(p, q, r):
    """Closest point to origin on triangle pqr: (closest, (wp, wq, wr))."""
    n = jnp.cross(q - p, r - p)
    nn = jnp.maximum(jnp.sum(n * n, -1), 1e-16)
    t = jnp.sum(p * n, -1) / nn
    proj = n * t[:, None]  # plane point closest to origin
    v0, v1, v2 = q - p, r - p, proj - p
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    den = jnp.maximum(d00 * d11 - d01 * d01, 1e-16)
    v = (d11 * d20 - d01 * d21) / den
    w = (d00 * d21 - d01 * d20) / den
    u = 1.0 - v - w
    inside = (u >= 0) & (v >= 0) & (w >= 0)

    c_pq, t_pq = _seg_bary(p, q)
    c_qr, t_qr = _seg_bary(q, r)
    c_pr, t_pr = _seg_bary(p, r)
    cands = jnp.stack([proj, c_pq, c_qr, c_pr], 1)             # (P,4,3)
    weights = jnp.stack([
        jnp.stack([u, v, w], -1),
        jnp.stack([1 - t_pq, t_pq, jnp.zeros_like(t_pq)], -1),
        jnp.stack([jnp.zeros_like(t_qr), 1 - t_qr, t_qr], -1),
        jnp.stack([1 - t_pr, jnp.zeros_like(t_pr), t_pr], -1),
    ], 1)                                                       # (P,4,3)
    dist = jnp.sum(cands * cands, -1)
    dist = dist.at[:, 0].set(jnp.where(inside, dist[:, 0], jnp.inf))
    k = jnp.argmin(dist, -1)
    closest = jnp.take_along_axis(cands, k[:, None, None], 1)[:, 0]
    wt = jnp.take_along_axis(weights, k[:, None, None], 1)[:, 0]
    return closest, wt


def _simplex_closest(simplex, count):
    """Closest point to origin on the active k-simplex, with per-slot
    barycentric weights and an origin-enclosed flag (k == 4 only).

    Returns (closest (P,3), weights (P,4), enclosed (P,))."""
    p4 = simplex.shape[0]
    a, b, c, d = (simplex[:, i] for i in range(4))
    zero = jnp.zeros((p4,))

    # k = 1.
    w1 = jnp.stack([jnp.ones_like(zero), zero, zero, zero], -1)
    c1 = a

    # k = 2.
    c2, t = _seg_bary(a, b)
    w2 = jnp.stack([1 - t, t, zero, zero], -1)

    # k = 3.
    c3, wt3 = _tri_bary(a, b, c)
    w3 = jnp.concatenate([wt3, zero[:, None]], -1)

    # k = 4: origin inside, or closest over the 4 faces.
    def signed(pp, qq, rr, ss):
        return jnp.sum(jnp.cross(qq - pp, rr - pp) * (ss - pp), -1)

    va = signed(b, c, d, a)
    vb_ = signed(a, c, d, b)
    vc_ = signed(a, b, d, c)
    vd_ = signed(a, b, c, d)
    o_a = signed(b, c, d, jnp.zeros_like(a))
    o_b = signed(a, c, d, jnp.zeros_like(a))
    o_c = signed(a, b, d, jnp.zeros_like(a))
    o_d = signed(a, b, c, jnp.zeros_like(a))
    enclosed = ((va * o_a >= 0) & (vb_ * o_b >= 0)
                & (vc_ * o_c >= 0) & (vd_ * o_d >= 0))

    f_abc, w_abc = _tri_bary(a, b, c)
    f_abd, w_abd = _tri_bary(a, b, d)
    f_acd, w_acd = _tri_bary(a, c, d)
    f_bcd, w_bcd = _tri_bary(b, c, d)
    fc = jnp.stack([f_abc, f_abd, f_acd, f_bcd], 1)
    fw = jnp.stack([
        jnp.concatenate([w_abc, zero[:, None]], -1),
        jnp.stack([w_abd[:, 0], w_abd[:, 1], zero, w_abd[:, 2]], -1),
        jnp.stack([w_acd[:, 0], zero, w_acd[:, 1], w_acd[:, 2]], -1),
        jnp.stack([zero, w_bcd[:, 0], w_bcd[:, 1], w_bcd[:, 2]], -1),
    ], 1)
    fd = jnp.sum(fc * fc, -1)
    k = jnp.argmin(fd, -1)
    c4 = jnp.take_along_axis(fc, k[:, None, None], 1)[:, 0]
    w4 = jnp.take_along_axis(fw, k[:, None, None], 1)[:, 0]

    closest = jnp.where((count <= 1)[:, None], c1,
              jnp.where((count == 2)[:, None], c2,
              jnp.where((count == 3)[:, None], c3, c4)))
    weights = jnp.where((count <= 1)[:, None], w1,
              jnp.where((count == 2)[:, None], w2,
              jnp.where((count == 3)[:, None], w3, w4)))
    enclosed = enclosed & (count == 4)
    return closest, weights, enclosed


def gjk(a: ShapeRef, b: ShapeRef):
    """Boolean overlap + termination simplex (for EPA seeding) + closest
    distance for separated pairs.  Johnson-style sub-simplex reduction via
    barycentric weights; (P,)-batched fixed iterations."""
    p = a.pos.shape[0]
    d0 = m.noz(b.pos - a.pos + 1e-6)
    s0, pa0, _ = minkowski_support(a, b, d0)
    simplex = jnp.tile(s0[:, None, :], (1, 4, 1))
    simplex_a = jnp.tile(pa0[:, None, :], (1, 4, 1))
    count = jnp.ones((p,), jnp.int32)
    overlap = jnp.zeros((p,), bool)
    done = jnp.zeros((p,), bool)
    rows = jnp.arange(p)

    def body(i, carry):
        simplex, simplex_a, count, overlap, done = carry
        closest, weights, enclosed = _simplex_closest(simplex, count)
        dist_sq = jnp.sum(closest * closest, -1)
        hit_now = (enclosed | (dist_sq < 1e-12)) & ~done
        overlap = overlap | hit_now
        done = done | hit_now

        # Reduce to the supporting sub-simplex (positive weights), sorted so
        # active vertices compact to the front.
        slot_active = weights > 1e-9
        order = jnp.argsort(~slot_active, axis=-1, stable=True)  # active first
        simplex_r = jnp.take_along_axis(simplex, order[..., None], 1)
        simplex_ar = jnp.take_along_axis(simplex_a, order[..., None], 1)
        new_count = jnp.sum(slot_active, -1).astype(jnp.int32)

        d = -closest
        s, pa, _ = minkowski_support(a, b, d)
        progress = (
            jnp.sum(s * d, -1) - jnp.max(jnp.sum(simplex * d[:, None, :], -1), -1)
        ) > 1e-9
        done = done | ~progress

        # Append the new support after the reduced simplex.
        idx = jnp.minimum(new_count, 3)
        appended = simplex_r.at[rows, idx].set(s)
        appended_a = simplex_ar.at[rows, idx].set(pa)
        simplex = jnp.where(done[:, None, None], simplex, appended)
        simplex_a = jnp.where(done[:, None, None], simplex_a, appended_a)
        count = jnp.where(done, count, jnp.minimum(new_count + 1, 4))
        return simplex, simplex_a, count, overlap, done

    simplex, simplex_a, count, overlap, done = jax.lax.fori_loop(
        0, GJK_ITERATIONS, body, (simplex, simplex_a, count, overlap, done)
    )
    closest, weights, enclosed = _simplex_closest(simplex, count)
    overlap = overlap | enclosed
    witness_a = jnp.sum(weights[..., None] * simplex_a, axis=1)
    return {
        "overlap": overlap,
        "simplex": simplex,
        "count": count,
        "distance": jnp.linalg.norm(closest + 1e-12, axis=-1),
        "closest": closest,
        "witness_a": witness_a,
        "witness_b": witness_a - closest,
    }


def epa(a: ShapeRef, b: ShapeRef, simplex):
    """Penetration normal/depth from an overlap simplex.

    Fixed-budget expanding-polytope: face list in a static buffer; each
    iteration splits the closest face toward its support point (the simple
    3-split variant — slightly conservative vs. full horizon re-triangulation,
    bounded error for physics-grade contacts)."""
    p = simplex.shape[0]

    # Inflate degenerate simplices to a tetrahedron around the origin.
    eps_dirs = jnp.array([
        [1.0, 1.0, 1.0], [-1.0, -1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, -1.0, -1.0],
    ]) * 1e-3
    verts0 = simplex + eps_dirs[None, :, :]

    max_v = 4 + EPA_ITERATIONS
    verts = jnp.zeros((p, max_v, 3)).at[:, :4].set(verts0)
    n_verts = jnp.full((p,), 4, jnp.int32)

    faces0 = jnp.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], jnp.int32)
    faces = jnp.zeros((p, EPA_MAX_FACES, 3), jnp.int32).at[:, :4].set(faces0)
    face_alive = jnp.zeros((p, EPA_MAX_FACES), bool).at[:, :4].set(True)
    n_faces = jnp.full((p,), 4, jnp.int32)

    centroid = jnp.mean(verts0, axis=1)  # interior point of the polytope

    def face_data(verts, faces, face_alive):
        va = verts[jnp.arange(p)[:, None], faces[..., 0]]
        vb = verts[jnp.arange(p)[:, None], faces[..., 1]]
        vc = verts[jnp.arange(p)[:, None], faces[..., 2]]
        n = jnp.cross(vb - va, vc - va)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        # Orient outward from the polytope interior (the centroid stays
        # interior under expansion), not from the origin — the origin can sit
        # on the boundary for touching contacts.
        flipv = jnp.sum(n * (va - centroid[:, None, :]), -1) < 0
        n = jnp.where(flipv[..., None], -n, n)
        dist = jnp.maximum(jnp.sum(n * va, -1), 0.0)
        dist = jnp.where(face_alive, dist, jnp.inf)
        return n, dist

    def body(i, carry):
        verts, n_verts, faces, face_alive, n_faces = carry
        normals, dists = face_data(verts, faces, face_alive)
        k = jnp.argmin(dists, -1)                      # (P,)
        n_best = jnp.take_along_axis(normals, k[:, None, None], 1)[:, 0]
        s, _, _ = minkowski_support(a, b, n_best)
        d_best = jnp.take_along_axis(dists, k[:, None], 1)[:, 0]
        grow = jnp.sum(s * n_best, -1) - d_best > 1e-5
        can_add = (n_faces + 2 <= EPA_MAX_FACES) & grow

        # Add vertex.
        vi = jnp.minimum(n_verts, max_v - 1)
        verts = verts.at[jnp.arange(p), vi].set(
            jnp.where(can_add[:, None], s, verts[jnp.arange(p), vi])
        )
        # Split face k -> (a,b,v), (b,c,v), (c,a,v): overwrite k, append 2.
        fk = faces[jnp.arange(p), k]
        f1 = jnp.stack([fk[:, 0], fk[:, 1], vi], -1)
        f2 = jnp.stack([fk[:, 1], fk[:, 2], vi], -1)
        f3 = jnp.stack([fk[:, 2], fk[:, 0], vi], -1)
        i1 = jnp.minimum(n_faces, EPA_MAX_FACES - 1)
        i2 = jnp.minimum(n_faces + 1, EPA_MAX_FACES - 1)
        r = jnp.arange(p)

        def put(faces, face_alive, idx, f):
            faces = faces.at[r, idx].set(jnp.where(can_add[:, None], f, faces[r, idx]))
            face_alive = face_alive.at[r, idx].set(
                jnp.where(can_add, True, face_alive[r, idx]))
            return faces, face_alive

        faces, face_alive = put(faces, face_alive, k, f1)
        faces, face_alive = put(faces, face_alive, i1, f2)
        faces, face_alive = put(faces, face_alive, i2, f3)
        n_faces = jnp.where(can_add, n_faces + 2, n_faces)
        n_verts = jnp.where(can_add, n_verts + 1, n_verts)
        return verts, n_verts, faces, face_alive, n_faces

    verts, n_verts, faces, face_alive, n_faces = jax.lax.fori_loop(
        0, EPA_ITERATIONS, body, (verts, n_verts, faces, face_alive, n_faces)
    )
    normals, dists = face_data(verts, faces, face_alive)
    k = jnp.argmin(dists, -1)
    normal = jnp.take_along_axis(normals, k[:, None, None], 1)[:, 0]
    depth = jnp.take_along_axis(dists, k[:, None], 1)[:, 0]

    # Witness points: deepest point of A along n and of B along -n; the
    # contact point is their midpoint.
    _, pa, pb = minkowski_support(a, b, normal)
    point = 0.5 * (pa + pb)
    return {"normal": normal, "depth": depth, "point": point}


def _mtd_base_dirs_np():
    import numpy as np
    dirs = []
    for x in (-1, 0, 1):
        for y in (-1, 0, 1):
            for z in (-1, 0, 1):
                if x or y or z:
                    v = np.array([x, y, z], np.float64)
                    dirs.append(v / np.linalg.norm(v))
    return np.stack(dirs).astype(np.float32)  # (26, 3)


_MTD_DIRS_NP = _mtd_base_dirs_np()


def _mtd_base_dirs():
    return jnp.asarray(_MTD_DIRS_NP)


def sampled_mtd(a: ShapeRef, b: ShapeRef, seed_dir, rounds=6):
    """Minimum-translation direction by direct support sampling + local
    refinement: depth(d) = dot(support_{A-B}(d), d); MTD = min over unit d.
    Monotone and topology-free — robust companion to EPA for deep overlap."""
    def height(d):
        s, _, _ = minkowski_support(a, b, d)
        return jnp.sum(s * d, -1)

    dirs = _mtd_base_dirs()                    # (26,3)
    p = a.pos.shape[0]
    # Evaluate base directions + the seed.
    hs = jax.vmap(lambda d: height(jnp.broadcast_to(d, (p, 3))))(dirs)  # (26,P)
    best_h = height(seed_dir)
    best_d = seed_dir
    k = jnp.argmin(hs, axis=0)
    base_h = jnp.take_along_axis(hs, k[None, :], 0)[0]
    use_base = base_h < best_h
    best_h = jnp.where(use_base, base_h, best_h)
    best_d = jnp.where(use_base[:, None], dirs[k], best_d)

    step = 0.5
    for _ in range(rounds):
        t1, t2 = m.orthonormal_basis(best_d)
        for (c1, c2) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            cand = m.noz(best_d + step * (c1 * t1 + c2 * t2))
            h = height(cand)
            better = h < best_h
            best_h = jnp.where(better, h, best_h)
            best_d = jnp.where(better[:, None], cand, best_d)
        step *= 0.5
    return best_d, best_h


def gjk_epa_contact(a: ShapeRef, b: ShapeRef):
    """Single-point contact for arbitrary convex pairs (margin-aware).

    Returns (normal a->b, point (P,1,3), depth (P,1), hit (P,1)).

    Shallow path (cores separated, surfaces within margins): exact witness
    points from GJK distance; deep path (cores overlap): EPA on the cores.
    Reference equivalents: collision_gjk.cpp + collision_epa.cpp."""
    res = gjk(a, b)
    msum = a.margin + b.margin

    # Shallow: core distance < margin sum.
    # closest = witness_a - witness_b points from B's core toward A's core,
    # so the A->B contact normal is its negation.
    dist = res["distance"]
    n_shallow = -res["closest"] / jnp.maximum(dist, 1e-9)[:, None]
    depth_shallow = msum - dist
    point_shallow = 0.5 * (
        res["witness_a"] + a.margin[:, None] * n_shallow
        + res["witness_b"] - b.margin[:, None] * n_shallow
    )
    shallow_hit = (~res["overlap"]) & (depth_shallow > 0.0) & (dist > 1e-9)

    # Deep (cores overlap): sampled-MTD support descent.  The 3-split EPA can
    # UNDERestimate depth when its polytope degenerates (a face drifts through
    # the origin), which makes contacts spongy; the sampled MTD is a strict
    # upper bound that converges from above and is topology-free, so it is
    # the production deep path (epa() remains available for diagnostics).
    seed = m.noz(b.pos - a.pos)
    n_deep, depth_core = sampled_mtd(a, b, seed)
    depth_deep = depth_core + msum
    _, pa_deep, pb_deep = minkowski_support(a, b, n_deep)
    point_deep = 0.5 * (pa_deep + pb_deep)

    hit = shallow_hit | res["overlap"]
    normal = jnp.where(res["overlap"][:, None], n_deep, n_shallow)
    depth = jnp.where(res["overlap"], depth_deep, depth_shallow)
    point = jnp.where(res["overlap"][:, None], point_deep, point_shallow)
    return normal, point[:, None, :], depth[:, None], hit[:, None]
