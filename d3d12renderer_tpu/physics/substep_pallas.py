"""Whole-substep fused Pallas kernel: forces -> plane narrowphase -> contact +
joint prep -> N-iteration sequential-impulse solve -> velocity integration, as
ONE TPU kernel per 1024-scene tile.

Why: the colored Pallas solver (solver_pallas.py) already keeps the iteration
loop in VMEM, but the pre-solver stages (force integration, plane narrowphase,
contact prep, joint prep) still run as XLA fusions over (batch, rows, 3)
tensors — measured 1.9 ms of the 2.9 ms locomotion-env substep at batch 2048 on
a v5e chip, all HBM round-trips.  This kernel runs the ENTIRE substep
(reference: src/physics/physics.cpp:1180-1360) on-chip.

Layout: "scalar rows x env lanes".  Every physical quantity is one (8, 128)
float32 tile whose lanes are 1024 parallel scenes; bodies / contact rows /
joint rows are unrolled in Python.  This is the exact TPU analogue of the
reference's 8-wide AVX2 SoA constraint batches (src/physics/constraints.h:12)
with lanes over *scenes* instead of rows, and it buys three things:

* archetype constants (anchors, axes, limits, masses, inertia) embed as
  immediate scalars instead of VMEM tables — zero HBM traffic for structure;
* symbolic zero/one elimination: skew matrices, diagonal inertias and
  static-world contact sides drop ~40% of the multiplies at trace time;
* row updates are naturally sequential -> exact Gauss-Seidel order without
  graph coloring (colors are still honored so results match the colored
  XLA/solver_pallas paths bit-for-bit, modulo the atan2/acos polynomials).

Supported archetypes (the locomotion-env family): plane contacts only
(sphere/capsule/box colliders), distance/ball/fixed/hinge/cone-twist joints,
compile-time coloring ("colored" contact mode), no terrain/buckets/SAP/force
fields.  Anything else falls back to the regular step (step.physics_substep).

Exposed through `jax.custom_batching.custom_vmap` like solver_pallas: the
per-scene `physics_substep` code path is unchanged; vmapped calls on TPU (or
with `PhysicsSettings(fused_substep="force")`, interpret mode off-TPU)
dispatch the fused kernel.

atan2/acos have no Mosaic lowering on this toolchain; Cephes-style polynomials
(max err 2.4e-7 over [-4,4]x[-3,3] / [-1,1]) stand in — joint-angle errors of
~1e-7 rad, far below the 1e-3 trajectory-parity budget (BASELINE.md).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import joints as joints_mod
from .solver_pallas import LANES, SUBS, TILE_B, _from_tiles, _to_tiles
from .types import (
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_SPHERE,
    BodyState,
)

# Reference constants (src/physics/constraints.cpp:9-17, 3360-3364).
CONTACT_SLOP = 0.001
BAUMGARTE_SCALE = 0.1

_SUPPORTED_JOINTS = ("distance", "ball", "fixed", "hinge", "cone_twist")
_OVERRIDE_KEYS = {"twist_target", "swing_target", "swing_axis_angle",
                  "motor_target"}
_NEG_BIG = -3.0e38  # stands in for -inf in the box-corner top-4 selection

# --------------------------------------------------------------------------
# Scalar-tile algebra.  Elements are (8,128) tiles OR Python floats; all
# arithmetic routes through _mul/_add/_sub so exact 0.0/1.0 constants are
# eliminated symbolically at trace time.
# --------------------------------------------------------------------------


def _is0(x):
    return isinstance(x, float) and x == 0.0


def _mul(x, y):
    if _is0(x) or _is0(y):
        return 0.0
    if isinstance(x, float) and x == 1.0:
        return y
    if isinstance(y, float) and y == 1.0:
        return x
    return x * y


def _add(x, y):
    if _is0(x):
        return y
    if _is0(y):
        return x
    return x + y


def _sub(x, y):
    if _is0(y):
        return x
    if _is0(x):
        return -y if not isinstance(y, float) else -y
    return x - y


def _vadd(a, b):
    return tuple(_add(x, y) for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(_sub(x, y) for x, y in zip(a, b))


def _vscale(a, s):
    return tuple(_mul(x, s) for x in a)


def _vdot(a, b):
    return _add(_add(_mul(a[0], b[0]), _mul(a[1], b[1])), _mul(a[2], b[2]))


def _vcross(a, b):
    return (
        _sub(_mul(a[1], b[2]), _mul(a[2], b[1])),
        _sub(_mul(a[2], b[0]), _mul(a[0], b[2])),
        _sub(_mul(a[0], b[1]), _mul(a[1], b[0])),
    )


def _vwhere(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _vneg(a):
    return tuple(-x if not _is0(x) else 0.0 for x in a)


def _guard_recip(k):
    """where(k != 0, 1/k, 0) with a static short-circuit for float k."""
    if isinstance(k, float):
        return 0.0 if k == 0.0 else 1.0 / k
    return jnp.where(k != 0, 1.0 / jnp.where(k == 0, 1.0, k), 0.0)


# Quaternions: (x, y, z, w) tuples (matches core/maths.py layout).


def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        _add(_add(_mul(aw, bx), _mul(ax, bw)), _sub(_mul(ay, bz), _mul(az, by))),
        _add(_sub(_mul(aw, by), _mul(ax, bz)), _add(_mul(ay, bw), _mul(az, bx))),
        _add(_add(_mul(aw, bz), _mul(ax, by)), _sub(_mul(az, bw), _mul(ay, bx))),
        _sub(_sub(_mul(aw, bw), _mul(ax, bx)), _add(_mul(ay, by), _mul(az, bz))),
    )


def _qconj(q):
    return (*(_vneg(q[:3])), q[3])


def _qrotate(q, v):
    """v + 2*cross(q.xyz, cross(q.xyz, v) + q.w*v)  (maths.quat_rotate)."""
    u = q[:3]
    t = _vadd(_vcross(u, v), _vscale(v, q[3]))
    return _vadd(v, _vscale(_vcross(u, t), 2.0))


def _qnormalize(q):
    n = jnp.sqrt(_add(_add(_mul(q[0], q[0]), _mul(q[1], q[1])),
                      _add(_mul(q[2], q[2]), _mul(q[3], q[3]))))
    inv = jnp.maximum(n, 1e-12)
    return tuple(x / inv if not _is0(x) else 0.0 for x in q)


def _vnormalize(v):
    n = jnp.sqrt(_vdot(v, v))
    inv = jnp.maximum(n, 1e-12)
    return tuple(x / inv if not _is0(x) else 0.0 for x in v)


def _noz(v, eps_sq=1e-8):
    """Normalize-or-zero, mirrors maths.noz."""
    sl = _vdot(v, v)
    d = jnp.sqrt(jnp.maximum(sl, eps_sq))
    n = tuple(x / d if not _is0(x) else 0.0 for x in v)
    small = sl < eps_sq
    return tuple(jnp.where(small, 0.0, x) for x in n)


# 3x3 matrices: row-major 9-tuples.


def _m3_from_quat(q):
    x, y, z, w = q
    xx, yy, zz = _mul(x, x), _mul(y, y), _mul(z, z)
    xy, xz, yz = _mul(x, y), _mul(x, z), _mul(y, z)
    wx, wy, wz = _mul(w, x), _mul(w, y), _mul(w, z)
    two = 2.0
    return (
        _sub(1.0, _mul(two, _add(yy, zz))), _mul(two, _sub(xy, wz)), _mul(two, _add(xz, wy)),
        _mul(two, _add(xy, wz)), _sub(1.0, _mul(two, _add(xx, zz))), _mul(two, _sub(yz, wx)),
        _mul(two, _sub(xz, wy)), _mul(two, _add(yz, wx)), _sub(1.0, _mul(two, _add(xx, yy))),
    )


def _m3v(M, v):
    return (
        _add(_add(_mul(M[0], v[0]), _mul(M[1], v[1])), _mul(M[2], v[2])),
        _add(_add(_mul(M[3], v[0]), _mul(M[4], v[1])), _mul(M[5], v[2])),
        _add(_add(_mul(M[6], v[0]), _mul(M[7], v[1])), _mul(M[8], v[2])),
    )


def _m3_mul(A, B):
    out = []
    for i in range(3):
        for j in range(3):
            out.append(_add(_add(_mul(A[3 * i], B[j]), _mul(A[3 * i + 1], B[3 + j])),
                            _mul(A[3 * i + 2], B[6 + j])))
    return tuple(out)


def _m3_t(A):
    return (A[0], A[3], A[6], A[1], A[4], A[7], A[2], A[5], A[8])


def _m3_add(A, B):
    return tuple(_add(a, b) for a, b in zip(A, B))


def _skew(v):
    x, y, z = v
    nx = -x if not _is0(x) else 0.0
    ny = -y if not _is0(y) else 0.0
    nz = -z if not _is0(z) else 0.0
    return (0.0, nz, y, z, 0.0, nx, ny, x, 0.0)


def _m3_zero():
    return (0.0,) * 9


def _m3_is_zero(M):
    return all(_is0(x) for x in M)


def _inv3(K):
    """Closed-form adjugate inverse with the +1e-9*eye fudge (joints._safe_inv3
    with active=True)."""
    a = _add(K[0], 1e-9)
    b, c = K[1], K[2]
    d, e = K[3], _add(K[4], 1e-9)
    f = K[5]
    g, h = K[6], K[7]
    i = _add(K[8], 1e-9)
    A = _sub(_mul(e, i), _mul(f, h))
    B = _sub(_mul(f, g), _mul(d, i))  # -(d*i - f*g)
    C = _sub(_mul(d, h), _mul(e, g))
    det = _add(_add(_mul(a, A), _mul(b, B)), _mul(c, C))
    inv_det = jnp.where(jnp.abs(det) > 1e-20,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    adj = (
        A, _sub(_mul(c, h), _mul(b, i)), _sub(_mul(b, f), _mul(c, e)),
        B, _sub(_mul(a, i), _mul(c, g)), _sub(_mul(c, d), _mul(a, f)),
        C, _sub(_mul(b, g), _mul(a, h)), _sub(_mul(a, e), _mul(b, d)),
    )
    return tuple(_mul(x, inv_det) for x in adj)


def _inv22(k00, k01, k10, k11):
    det = _sub(_mul(k00, k11), _mul(k01, k10))
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    return (_mul(k11, inv_det), _mul(-1.0, _mul(k01, inv_det)),
            _mul(-1.0, _mul(k10, inv_det)), _mul(k00, inv_det))


# Transcendentals without a Mosaic lowering: Cephes-style polynomials.


def _atan_core(t):
    """atan on [0, 1] with the second range reduction to [0, tan(pi/8)]."""
    hi = t > 0.4142135623730951
    t2 = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
    s = t2 * t2
    p = ((8.05374449538e-2 * s - 1.38776856032e-1) * s + 1.99777106478e-1) * s \
        - 3.33329491539e-1
    r = t2 + t2 * s * p
    return jnp.where(hi, r + float(np.pi / 4), r)


def _atan2(y, x):
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    r = _atan_core(t)
    r = jnp.where(ay > ax, float(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, float(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(c):
    c = jnp.clip(c, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum((1.0 - c) * (1.0 + c), 0.0)), c)


def _orthonormal_basis(n):
    """Pixar/Duff branch-free ONB (maths.orthonormal_basis)."""
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[2])
    b = _mul(_mul(n[0], n[1]), a)
    t1 = (1.0 + sign * _mul(_mul(n[0], n[0]), a), sign * b, -sign * n[0])
    t2 = (b, sign + _mul(_mul(n[1], n[1]), a),
          -n[1] if not _is0(n[1]) else 0.0)
    return t1, t2


def _np_orthonormal_basis(n):
    """Host mirror of maths.orthonormal_basis for constant vectors."""
    sign = 1.0 if n[2] >= 0.0 else -1.0
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    t1 = (1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0])
    t2 = (b, sign + n[1] * n[1] * a, -n[1])
    return t1, t2


def _quat_from_to_const_a(a_const, b, t1_const):
    """maths.quat_from_to with a constant source vector."""
    w = _add(1.0, _vdot(a_const, b))
    v = _vcross(a_const, b)
    anti = w < 1e-6
    v = tuple(jnp.where(anti, tc, x) for tc, x in zip(t1_const, v))
    w = jnp.where(anti, 0.0, w)
    return _qnormalize((v[0], v[1], v[2], w))


def _quat_to_axis_angle(q):
    v = q[:3]
    l = jnp.sqrt(_vdot(v, v))
    angle = 2.0 * _atan2(l, q[3])
    big = l > 1e-9
    d = jnp.maximum(l, 1e-9)
    axis = (
        jnp.where(big, v[0] / d, 1.0),
        jnp.where(big, v[1] / d, 0.0),
        jnp.where(big, v[2] / d, 0.0),
    )
    return axis, angle


def _quat_integrate(q, omega, dt):
    omega_q = (_mul(0.5, omega[0]), _mul(0.5, omega[1]), _mul(0.5, omega[2]), 0.0)
    dq = _qmul(omega_q, q)
    return _qnormalize(tuple(_add(x, _mul(d, dt)) for x, d in zip(q, dq)))


def _axial(axis, ii_a, ii_b):
    """joints._axial_limit_motor with active=True."""
    ta = _m3v(ii_a, axis)
    tb = _m3v(ii_b, axis)
    invk = _add(_vdot(axis, ta), _vdot(axis, tb))
    return _guard_recip(invk), ta, tb


# --------------------------------------------------------------------------
# Support detection + host-side constant extraction
# --------------------------------------------------------------------------


def _g(x):
    return np.asarray(jax.device_get(x))


def support_reason(arch, settings) -> Optional[str]:
    """None if the fused kernel can run this archetype, else why not."""
    if settings.contact_mode != "colored":
        return f"contact_mode {settings.contact_mode!r}"
    if settings.solver_backend == "xla":
        return "solver_backend xla"
    if arch.vs_terrain_collider.shape[0] > 0:
        return "terrain rows"
    if arch.contact_buckets:
        return "pair buckets"
    if arch.sap_neighbors > 0:
        return "runtime broadphase"
    if arch.ff_center.shape[0] > 0:
        return "force fields"
    for (stype, _, _) in arch.vs_plane_segments:
        if stype not in (SHAPE_SPHERE, SHAPE_CAPSULE, SHAPE_BOX):
            return f"plane collider type {stype}"
    for t in arch.joints:
        if t.kind not in _SUPPORTED_JOINTS:
            return f"joint kind {t.kind!r}"
    if arch.num_bodies > 64:
        return "too many bodies"
    if arch.vs_plane_collider.shape[0] > 256:
        return "too many plane rows"
    return None


def _extract_consts(arch):
    """Pull every static quantity the kernel embeds off-device as floats."""
    N = arch.num_bodies
    body = dict(
        inv_mass=_g(arch.inv_mass)[:N],
        inv_inertia=_g(arch.inv_inertia)[:N],
        gravity_factor=_g(arch.gravity_factor)[:N],
        linear_damping=_g(arch.linear_damping)[:N],
        angular_damping=_g(arch.angular_damping)[:N],
        local_cog=_g(arch.local_cog)[:N],
    )

    rows = []
    ci = _g(arch.vs_plane_collider)
    pi = _g(arch.vs_plane_plane)
    bi = _g(arch.vs_plane_body)
    valid = _g(arch.vs_plane_valid)
    col_type = _g(arch.col_type)
    col_size = _g(arch.col_size)
    col_lp = _g(arch.col_local_pos)
    col_lr = _g(arch.col_local_rot)
    col_f = _g(arch.col_friction)
    col_r = _g(arch.col_restitution)
    pn = _g(arch.plane_normal)
    po = _g(arch.plane_offset)
    pf = _g(arch.plane_friction)
    pr = _g(arch.plane_restitution)
    for r in range(ci.shape[0]):
        if not bool(valid[r]):
            rows.append(None)  # keep table indices aligned with color lists
            continue
        c, p, b = int(ci[r]), int(pi[r]), int(bi[r])
        fric = float(np.clip(np.sqrt(col_f[c] * pf[p]), 0.0, 1.0))
        rest = float(np.clip(max(col_r[c], pr[p]), 0.0, 1.0))
        rows.append(dict(
            body=b, type=int(col_type[c]),
            size=tuple(float(x) for x in col_size[c]),
            local_pos=tuple(float(x) for x in col_lp[c]),
            local_rot=tuple(float(x) for x in col_lr[c]),
            n=tuple(float(x) for x in pn[p]), off=float(po[p]),
            friction=fric, restitution=rest,
        ))
    contact_colors = [list(np.asarray(_g(idx)).astype(int))
                      for idx in arch.contact_color_indices]

    order = {k: i for i, k in enumerate(joints_mod.JOINT_SOLVE_ORDER)}
    table_order = sorted(range(len(arch.joints)),
                         key=lambda k: order[arch.joints[k].kind])
    tables = []
    for k in table_order:
        t = arch.joints[k]
        ba, bb = _g(t.body_a), _g(t.body_b)
        tvalid = _g(t.valid)
        params = {key: _g(v) for key, v in t.params.items()}
        jrows = []
        for j in range(ba.shape[0]):
            a, b = int(ba[j]), int(bb[j])
            im_a = float(body["inv_mass"][a]) if a < N else 0.0
            im_b = float(body["inv_mass"][b]) if b < N else 0.0
            active = bool(tvalid[j]) and (im_a > 0 or im_b > 0)
            if not active:
                jrows.append(None)
                continue
            row = dict(a=a, b=b, im_a=im_a, im_b=im_b)
            for key, v in params.items():
                val = v[j]
                row[key] = (tuple(float(x) for x in np.ravel(val))
                            if np.ndim(val) > 0 else float(val))
            jrows.append(row)
        colors = [list(np.asarray(_g(idx)).astype(int))
                  for idx in arch.joint_color_indices[k]]
        tables.append(dict(kind=t.kind, arch_index=k, rows=jrows,
                           colors=colors))
    return body, rows, contact_colors, tables


# --------------------------------------------------------------------------
# Kernel stages (run at trace time over tile tuples)
# --------------------------------------------------------------------------


def _stage_forces(body, pos, rot, vel, omega, force, torque, dt, gff):
    """integrate_forces (step.py:32; reference src/physics/rigid_body.cpp:95)."""
    n = len(pos)
    rotm = [_m3_from_quat(rot[i]) for i in range(n)]
    ii_local = body["inv_inertia"]
    ii_w = []
    new_vel, new_omega = [], []
    for i in range(n):
        I = tuple(float(x) for x in ii_local[i].reshape(-1))
        iw = _m3_mul(_m3_mul(rotm[i], I), _m3_t(rotm[i]))
        ii_w.append(iw)
        im = float(body["inv_mass"][i])
        moving = im > 0.0
        f = _vadd(force[i], gff)
        if moving:
            grav = (0.0, -9.81 * float(body["gravity_factor"][i]), 0.0)
            lin_acc = _vadd(grav, _vscale(f, im))
        else:
            lin_acc = (0.0, 0.0, 0.0)
        ang_acc = _m3v(iw, torque[i])
        ld = 1.0 + dt * float(body["linear_damping"][i])
        ad = 1.0 + dt * float(body["angular_damping"][i])
        v = _vadd(vel[i], _vscale(lin_acc, dt))
        w = _vadd(omega[i], _vscale(ang_acc, dt))
        new_vel.append(tuple(x / ld for x in v))
        new_omega.append(tuple((x / ad if not _is0(x) else 0.0) for x in w))
    return new_vel, new_omega, ii_w


def _top4_of_8(pts, deps, hits):
    """Iterated masked argmax (narrow.jax_top_k semantics): returns the 4
    deepest hit corners in descending-score order."""
    score = [jnp.where(h, d, _NEG_BIG) for d, h in zip(deps, hits)]
    out = []
    for _ in range(4):
        best = score[0]
        besti = jnp.zeros_like(score[0], jnp.int32)
        for j in range(1, 8):
            better = score[j] > best
            best = jnp.where(better, score[j], best)
            besti = jnp.where(better, j, besti)
        sel_p = [0.0, 0.0, 0.0]
        sel_d = 0.0
        sel_h = None
        for j in range(8):
            on = besti == j
            for c in range(3):
                sel_p[c] = _add(sel_p[c], jnp.where(on, pts[j][c], 0.0))
            sel_d = _add(sel_d, jnp.where(on, deps[j], 0.0))
            hj = on & hits[j]
            sel_h = hj if sel_h is None else (sel_h | hj)
            score[j] = jnp.where(on, _NEG_BIG, score[j])
        out.append((tuple(sel_p), sel_d, sel_h))
    return out


def _stage_narrow(row, pos, rot):
    """Plane narrowphase for one row (narrow.py sphere/capsule/box_vs_plane;
    reference src/physics/collision_narrow.cpp vs-plane paths)."""
    b = row["body"]
    qb = rot[b]
    wrot = _qmul(qb, row["local_rot"])
    rel = tuple(lp - lc for lp, lc in zip(row["local_pos"], row["lcog"]))
    wpos = _vadd(pos[b], _qrotate(qb, rel))
    n = row["n"]
    off = row["off"]

    def plane_pt(p):
        dist = _sub(_vdot(n, p), off)
        return dist

    if row["type"] == SHAPE_SPHERE:
        radius = row["size"][0]
        dist = plane_pt(wpos)
        depth = _sub(radius, dist)
        hit = depth >= 0.0
        point = _vsub(wpos, _vscale(n, _add(dist, _mul(0.5, depth))))
        return [(point, depth, hit)]
    if row["type"] == SHAPE_CAPSULE:
        radius, hl = row["size"][0], row["size"][1]
        axis = _qrotate(wrot, (0.0, 1.0, 0.0))
        pts = []
        for sgn in (-1.0, 1.0):
            p = _vadd(wpos, _vscale(axis, sgn * hl))
            dist = plane_pt(p)
            depth = _sub(radius, dist)
            hit = depth >= 0.0
            point = _vsub(p, _vscale(n, _add(dist, _mul(0.5, depth))))
            pts.append((point, depth, hit))
        return pts
    # Box: 8 corners -> 4 deepest (narrow.box_vs_plane via _pad_points).
    half = row["size"]
    corners, deps, hits = [], [], []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                local = (sx * half[0], sy * half[1], sz * half[2])
                p = _vadd(wpos, _qrotate(wrot, local))
                dist = plane_pt(p)
                depth = -dist
                hit = depth >= 0.0
                p = _vadd(p, _vscale(n, _mul(0.5, depth)))
                corners.append(p)
                deps.append(depth)
                hits.append(hit)
    # narrow._BOX_CORNERS order is (-,-,-),(+,-,-),(-,+,-),(+,+,-),(-,-,+)...
    # i.e. x fastest; reorder our z-fastest enumeration to match exactly.
    perm = [0, 4, 2, 6, 1, 5, 3, 7]
    corners = [corners[i] for i in perm]
    deps = [deps[i] for i in perm]
    hits = [hits[i] for i in perm]
    return _top4_of_8(corners, deps, hits)


def _stage_contact_prep(row, manifold, pos, vel, omega, ii_w, inv_mass, dt):
    """solver.prep_contacts_full specialized to a static world A side."""
    b = row["body"]
    im_b = float(inv_mass[b])
    ii_b = ii_w[b]
    n = row["n"]
    pts = []
    for (point, depth, hit) in manifold:
        r_b = _vsub(point, pos[b])
        relv = _vadd(vel[b], _vcross(omega[b], r_b))
        vrel_n = _vdot(relv, n)
        tangent = _noz(_vsub(relv, _vscale(n, vrel_n)))

        def eff(direction):
            cr = _vcross(r_b, direction)
            to_w = _m3v(ii_b, cr)
            k = _add(im_b, _vdot(cr, to_w))
            return _guard_recip(k), to_w

        eff_n, n_to_wb = eff(n)
        eff_t, t_to_wb = eff(tangent)
        bias = jnp.where(
            (depth > CONTACT_SLOP) & (vrel_n < 0.0),
            _add(_mul(-row["restitution"], vrel_n),
                 _mul(BAUMGARTE_SCALE / dt, _sub(depth, CONTACT_SLOP))),
            0.0,
        )
        pts.append(dict(r_b=r_b, tangent=tangent, bias=bias, eff_n=eff_n,
                        eff_t=eff_t, n_to_wb=n_to_wb, t_to_wb=t_to_wb,
                        mask=hit))
    return dict(n=n, im_b=im_b, friction=row["friction"], body=b, pts=pts)


def _common_joint(row, body, pos, rot, ii_w):
    a, b = row["a"], row["b"]
    qa, qb = rot[a], rot[b]
    ra = _qrotate(qa, tuple(x - c for x, c in
                            zip(row["anchor_a"], body["local_cog"][a])))
    rb = _qrotate(qb, tuple(x - c for x, c in
                            zip(row["anchor_b"], body["local_cog"][b])))
    ga = _vadd(pos[a], ra)
    gb = _vadd(pos[b], rb)
    return a, b, qa, qb, ra, rb, ga, gb, ii_w[a], ii_w[b]


def _ball_K_inv(ra, rb, im_a, im_b, ii_a, ii_b):
    sa, sb = _skew(ra), _skew(rb)
    K = _m3_add(_m3_mul(_m3_mul(sa, ii_a), _m3_t(sa)),
                _m3_mul(_m3_mul(sb, ii_b), _m3_t(sb)))
    ims = im_a + im_b
    K = _m3_add(K, (ims, 0.0, 0.0, 0.0, ims, 0.0, 0.0, 0.0, ims))
    return _inv3(K)


def _prep_distance(row, body, pos, rot, ii_w, dt):
    a, b, qa, qb, ra, rb, ga, gb, ii_a, ii_b = _common_joint(row, body, pos, rot, ii_w)
    u = _vsub(gb, ga)
    l = jnp.sqrt(_vdot(u, u))
    big = l > 1e-3
    d = jnp.maximum(l, 1e-3)
    u = tuple(jnp.where(big, x / d, 0.0) for x in u)
    bias = _mul(_sub(l, row["length"]), joints_mod.DISTANCE_BETA / dt)
    ca, cb = _vcross(ra, u), _vcross(rb, u)
    to_wa, to_wb = _m3v(ii_a, ca), _m3v(ii_b, cb)
    k = _add(_add(row["im_a"] + row["im_b"], _vdot(ca, to_wa)), _vdot(cb, to_wb))
    return dict(kind="distance", a=a, b=b, im_a=row["im_a"], im_b=row["im_b"],
                ra=ra, rb=rb, u=u, bias=bias, eff=_guard_recip(k),
                to_wa=to_wa, to_wb=to_wb, n_imp=0)


def _prep_ball_core(row, body, pos, rot, ii_w, dt):
    a, b, qa, qb, ra, rb, ga, gb, ii_a, ii_b = _common_joint(row, body, pos, rot, ii_w)
    inv_K = _ball_K_inv(ra, rb, row["im_a"], row["im_b"], ii_a, ii_b)
    bias = _vscale(_vsub(gb, ga), joints_mod.BALL_BETA / dt)
    return dict(a=a, b=b, im_a=row["im_a"], im_b=row["im_b"], ra=ra, rb=rb,
                inv_K=inv_K, bias=bias, ii_a=ii_a, ii_b=ii_b,
                qa=qa, qb=qb, n_imp=0)


def _prep_ball(row, body, pos, rot, ii_w, dt):
    p = _prep_ball_core(row, body, pos, rot, ii_w, dt)
    p["kind"] = "ball"
    return p


def _prep_fixed(row, body, pos, rot, ii_w, dt):
    p = _prep_ball_core(row, body, pos, rot, ii_w, dt)
    p["kind"] = "fixed"
    p["inv_K_rot"] = _inv3(_m3_add(p["ii_a"], p["ii_b"]))
    rot_err = _qmul(p["qb"], _qmul(row["init_inv_rot"], _qconj(p["qa"])))
    p["r_bias3"] = _vscale(rot_err[:3], 2.0 * joints_mod.SLIDER_BETA / dt)
    return p


def _prep_hinge(row, body, pos, rot, ii_w, dt, ovr):
    """joints._prep_hinge (reference src/physics/constraints.cpp:1081-1310)."""
    p = _prep_ball_core(row, body, pos, rot, ii_w, dt)
    p["kind"] = "hinge"
    qa, qb, ii_a, ii_b = p["qa"], p["qb"], p["ii_a"], p["ii_b"]

    axis_a_w = _qrotate(qa, row["axis_a"])
    axis_b_w = _qrotate(qb, row["axis_b"])
    tb, bb = _orthonormal_basis(axis_b_w)
    bxa = _vcross(tb, axis_a_w)
    cxa = _vcross(bb, axis_a_w)
    sum_b = _vadd(_m3v(ii_a, bxa), _m3v(ii_b, bxa))
    sum_c = _vadd(_m3v(ii_a, cxa), _m3v(ii_b, cxa))
    p["i2"] = _inv22(_vdot(bxa, sum_b), _vdot(bxa, sum_c),
                     _vdot(cxa, sum_b), _vdot(cxa, sum_c))
    rbeta = joints_mod.HINGE_ROTATION_BETA / dt
    p["r_bias"] = (_mul(_vdot(axis_a_w, tb), rbeta),
                   _mul(_vdot(axis_a_w, bb), rbeta))
    p["bxa"], p["cxa"], p["axis"] = bxa, cxa, axis_a_w

    cmp_a = _qrotate(_qconj(qa), _qrotate(qb, row["tangent_b"]))
    angle = _atan2(_vdot(cmp_a, row["bitangent_a"]),
                   _vdot(cmp_a, row["tangent_a"]))

    min_l, max_l = row["min_limit"], row["max_limit"]
    min_active, max_active = min_l <= 0.0, max_l >= 0.0
    eff_ax, to_wa_ax, to_wb_ax = _axial(axis_a_w, ii_a, ii_b)
    p["to_wa_ax"], p["to_wb_ax"] = to_wa_ax, to_wb_ax
    p["has_limit"] = min_active or max_active
    if p["has_limit"]:
        min_v = (angle <= min_l) if min_active else False
        max_v = (angle >= max_l) if max_active else False
        solve_limit = (min_v | max_v) if (min_active and max_active) \
            else (min_v if min_active else max_v)
        if min_active and max_active:
            p["limit_sign"] = jnp.where(min_v, 1.0, -1.0)
            d = jnp.where(min_v, _sub(angle, min_l), _sub(max_l, angle))
        elif min_active:
            p["limit_sign"] = jnp.where(min_v, 1.0, -1.0)
            d = _sub(angle, min_l)
        else:
            p["limit_sign"] = -1.0
            d = _sub(max_l, angle)
        p["eff_limit"] = jnp.where(solve_limit, eff_ax, 0.0)
        p["limit_bias"] = _mul(d, joints_mod.HINGE_LIMIT_BETA / dt)

    p["has_motor"] = row["max_torque"] > 0.0
    if p["has_motor"]:
        p["max_imp"] = max(row["max_torque"], 0.0) * dt
        tgt = ovr.get("motor_target", row.get("motor_target", 0.0))
        lo = min_l if min_active else -math.pi
        hi = max_l if max_active else math.pi
        if isinstance(tgt, float):
            tgt = min(max(tgt, lo), hi)
        else:
            tgt = jnp.clip(tgt, lo, hi)
        if row["motor_type"] == joints_mod.MOTOR_POSITION:
            p["motor_vel"] = _mul(_sub(tgt, angle), 1.0 / dt)
        else:
            p["motor_vel"] = ovr.get("motor_target",
                                     row.get("motor_target", 0.0))
        p["eff_motor"] = eff_ax
    p["n_imp"] = 2
    return p


def _prep_cone_twist(row, body, pos, rot, ii_w, dt, ovr):
    """joints._prep_cone_twist (reference src/physics/constraints.cpp:1782-2070)."""
    p = _prep_ball_core(row, body, pos, rot, ii_w, dt)
    p["kind"] = "cone_twist"
    qa, qb, ii_a, ii_b = p["qa"], p["qb"], p["ii_a"], p["ii_b"]

    btoa = _qmul(_qconj(qa), qb)
    axis_cmp = _qrotate(btoa, row["axis_b"])
    t1_const, _ = _np_orthonormal_basis(row["axis_a"])
    swing_q = _quat_from_to_const_a(row["axis_a"], axis_cmp, t1_const)
    twist_tan = _qrotate(swing_q, row["tangent_a"])
    twist_bitan = _qrotate(swing_q, row["bitangent_a"])
    tan_cmp = _qrotate(btoa, row["tangent_b"])
    twist_angle = _atan2(_vdot(tan_cmp, twist_bitan), _vdot(tan_cmp, twist_tan))
    swing_axis_l, swing_angle = _quat_to_axis_angle(swing_q)
    neg = swing_angle < 0.0
    swing_angle = jnp.abs(swing_angle)
    swing_axis_l = _vwhere(neg, _vneg(swing_axis_l), swing_axis_l)

    sl = row["swing_limit"]
    p["has_swing_limit"] = sl >= 0.0
    swing_axis_w = _qrotate(qa, swing_axis_l)
    eff_swing, sw_to_wa, sw_to_wb = _axial(swing_axis_w, ii_a, ii_b)
    if p["has_swing_limit"]:
        p["_swing_axis"] = swing_axis_w
        p["eff_swing"] = jnp.where(swing_angle >= sl, eff_swing, 0.0)
        p["swing_bias"] = _mul(_sub(sl, swing_angle),
                               joints_mod.HINGE_LIMIT_BETA / dt)
        p["sw_to_wa"], p["sw_to_wb"] = sw_to_wa, sw_to_wb

    p["has_swing_motor"] = row["max_swing_torque"] > 0.0
    if p["has_swing_motor"]:
        p["max_swing_imp"] = max(row["max_swing_torque"], 0.0) * dt
        saa = ovr.get("swing_axis_angle", row.get("swing_axis_angle", 0.0))
        if isinstance(saa, float):
            ax_c, ax_s = math.cos(saa), math.sin(saa)
        else:
            ax_c, ax_s = jnp.cos(saa), jnp.sin(saa)
        local_motor_axis = _vadd(_vscale(row["tangent_a"], ax_c),
                                 _vscale(row["bitangent_a"], ax_s))
        s_tgt = ovr.get("swing_target", row.get("swing_target", 0.0))
        if p["has_swing_limit"]:
            s_tgt = (min(max(s_tgt, -sl), sl) if isinstance(s_tgt, float)
                     else jnp.clip(s_tgt, -sl, sl))
        if row["swing_motor_type"] == joints_mod.MOTOR_POSITION:
            half = _mul(0.5, s_tgt)
            sh = jnp.sin(half) if not isinstance(half, float) else math.sin(half)
            ch = jnp.cos(half) if not isinstance(half, float) else math.cos(half)
            rot_q = (_mul(local_motor_axis[0], sh), _mul(local_motor_axis[1], sh),
                     _mul(local_motor_axis[2], sh), ch)
            local_target_dir = _qrotate(rot_q, row["axis_a"])
            pos_axis_l = _noz(_vcross(axis_cmp, local_target_dir))
            cos_ang = jnp.clip(_vdot(local_target_dir, axis_cmp), 0.0, 1.0)
            pos_vel = _mul(_acos(cos_ang),
                           joints_mod.SWING_MOTOR_GAIN / dt)
            motor_axis_l = pos_axis_l
            p["swing_motor_vel"] = pos_vel
        else:
            motor_axis_l = local_motor_axis
            p["swing_motor_vel"] = ovr.get("swing_target",
                                           row.get("swing_target", 0.0))
        axw = _qrotate(qa, motor_axis_l)
        p["_swm_axis"] = axw
        p["eff_swing_motor"], p["swm_to_wa"], p["swm_to_wb"] = \
            _axial(axw, ii_a, ii_b)

    tl = row["twist_limit"]
    twist_axis_w = _qrotate(qa, row["axis_a"])
    p["twist_axis"] = twist_axis_w
    eff_tw, tw_to_wa, tw_to_wb = _axial(twist_axis_w, ii_a, ii_b)
    p["tw_to_wa"], p["tw_to_wb"] = tw_to_wa, tw_to_wb
    p["has_twist_limit"] = tl >= 0.0
    if p["has_twist_limit"]:
        min_v = twist_angle <= -tl
        max_v = twist_angle >= tl
        p["eff_twist_limit"] = jnp.where(min_v | max_v, eff_tw, 0.0)
        p["twist_sign"] = jnp.where(min_v, 1.0, -1.0)
        d = jnp.where(min_v, _add(tl, twist_angle), _sub(tl, twist_angle))
        p["twist_bias"] = _mul(d, joints_mod.TWIST_LIMIT_BETA / dt)

    p["has_twist_motor"] = row["max_twist_torque"] > 0.0
    if p["has_twist_motor"]:
        p["max_twist_imp"] = max(row["max_twist_torque"], 0.0) * dt
        lim = tl if p["has_twist_limit"] else math.pi
        t_tgt = ovr.get("twist_target", row.get("twist_target", 0.0))
        t_tgt = (min(max(t_tgt, -lim), lim) if isinstance(t_tgt, float)
                 else jnp.clip(t_tgt, -lim, lim))
        if row["twist_motor_type"] == joints_mod.MOTOR_POSITION:
            p["twist_motor_vel"] = _mul(_sub(t_tgt, twist_angle), 1.0 / dt)
        else:
            p["twist_motor_vel"] = ovr.get("twist_target",
                                           row.get("twist_target", 0.0))
        p["eff_twist_motor"] = eff_tw
    p["n_imp"] = 4
    return p


# --------------------------------------------------------------------------
# Per-row solve functions (value semantics over (va, wa, vb, wb) vec tuples)
# --------------------------------------------------------------------------


def _apply_linear3(p, P, va, wa, vb, wb):
    va = _vsub(va, _vscale(P, p["im_a"]))
    wa = _vsub(wa, _m3v(p["ii_a"], _vcross(p["ra"], P)))
    vb = _vadd(vb, _vscale(P, p["im_b"]))
    wb = _vadd(wb, _m3v(p["ii_b"], _vcross(p["rb"], P)))
    return va, wa, vb, wb


def _solve_ball_part(p, va, wa, vb, wb):
    av_a = _vadd(va, _vcross(wa, p["ra"]))
    av_b = _vadd(vb, _vcross(wb, p["rb"]))
    cdot = _vadd(_vsub(av_b, av_a), p["bias"])
    P = _vneg(_m3v(p["inv_K"], cdot))
    return _apply_linear3(p, P, va, wa, vb, wb)


def _solve_distance_row(p, va, wa, vb, wb, imp):
    av_a = _vadd(va, _vcross(wa, p["ra"]))
    av_b = _vadd(vb, _vcross(wb, p["rb"]))
    cdot = _add(_vdot(p["u"], _vsub(av_b, av_a)), p["bias"])
    lam = _mul(-1.0, _mul(p["eff"], cdot))
    P = _vscale(p["u"], lam)
    va = _vsub(va, _vscale(P, p["im_a"]))
    wa = _vsub(wa, _vscale(p["to_wa"], lam))
    vb = _vadd(vb, _vscale(P, p["im_b"]))
    wb = _vadd(wb, _vscale(p["to_wb"], lam))
    return va, wa, vb, wb, imp


def _solve_ball_row(p, va, wa, vb, wb, imp):
    va, wa, vb, wb = _solve_ball_part(p, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _solve_fixed_row(p, va, wa, vb, wb, imp):
    lam = _vneg(_m3v(p["inv_K_rot"], _vadd(_vsub(wb, wa), p["r_bias3"])))
    wa = _vsub(wa, _m3v(p["ii_a"], lam))
    wb = _vadd(wb, _m3v(p["ii_b"], lam))
    va, wa, vb, wb = _solve_ball_part(p, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _axial_motor(axis, eff, vel_tgt, max_imp, to_wa, to_wb, wa, wb, imp, slot):
    relw = _sub(_vdot(axis, wb), _vdot(axis, wa))
    lam = _mul(-1.0, _mul(eff, _sub(relw, vel_tgt)))
    new = jnp.clip(_add(imp[slot], lam), -max_imp, max_imp)
    lam = _sub(new, imp[slot])
    imp[slot] = new
    wa = _vsub(wa, _vscale(to_wa, lam))
    wb = _vadd(wb, _vscale(to_wb, lam))
    return wa, wb


def _axial_limit(axis, eff, sign, bias, to_wa, to_wb, wa, wb, imp, slot):
    relw = _mul(sign, _sub(_vdot(axis, wb), _vdot(axis, wa)))
    lam = _mul(-1.0, _mul(eff, _add(relw, bias)))
    new = jnp.maximum(_add(imp[slot], lam), 0.0)
    lam = _mul(_sub(new, imp[slot]), sign)
    imp[slot] = new
    wa = _vsub(wa, _vscale(to_wa, lam))
    wb = _vadd(wb, _vscale(to_wb, lam))
    return wa, wb


def _solve_hinge_row(p, va, wa, vb, wb, imp):
    """Motor -> limit -> rotation -> position (constraints.cpp:1240)."""
    if p["has_motor"]:
        wa, wb = _axial_motor(p["axis"], p["eff_motor"], p["motor_vel"],
                              p["max_imp"], p["to_wa_ax"], p["to_wb_ax"],
                              wa, wb, imp, 0)
    if p["has_limit"]:
        wa, wb = _axial_limit(p["axis"], p["eff_limit"], p["limit_sign"],
                              p["limit_bias"], p["to_wa_ax"], p["to_wb_ax"],
                              wa, wb, imp, 1)
    dw = _vsub(wb, wa)
    c0 = _add(_vdot(p["bxa"], dw), p["r_bias"][0])
    c1 = _add(_vdot(p["cxa"], dw), p["r_bias"][1])
    i00, i01, i10, i11 = p["i2"]
    l0 = _mul(-1.0, _add(_mul(i00, c0), _mul(i01, c1)))
    l1 = _mul(-1.0, _add(_mul(i10, c0), _mul(i11, c1)))
    P = _vadd(_vscale(p["bxa"], l0), _vscale(p["cxa"], l1))
    wa = _vsub(wa, _m3v(p["ii_a"], P))
    wb = _vadd(wb, _m3v(p["ii_b"], P))
    va, wa, vb, wb = _solve_ball_part(p, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _solve_cone_twist_row(p, va, wa, vb, wb, imp):
    """Twist motor -> swing motor -> twist limit -> swing limit -> position
    (constraints.cpp:1986; swing limit sign inverted per :2035-2048)."""
    ax = p["twist_axis"]
    if p["has_twist_motor"]:
        wa, wb = _axial_motor(ax, p["eff_twist_motor"], p["twist_motor_vel"],
                              p["max_twist_imp"], p["tw_to_wa"], p["tw_to_wb"],
                              wa, wb, imp, 0)
    if p["has_swing_motor"]:
        wa, wb = _axial_motor(p["_swm_axis"], p["eff_swing_motor"],
                              p["swing_motor_vel"], p["max_swing_imp"],
                              p["swm_to_wa"], p["swm_to_wb"], wa, wb, imp, 1)
    if p["has_twist_limit"]:
        wa, wb = _axial_limit(ax, p["eff_twist_limit"], p["twist_sign"],
                              p["twist_bias"], p["tw_to_wa"], p["tw_to_wb"],
                              wa, wb, imp, 2)
    if p["has_swing_limit"]:
        axs = p["_swing_axis"]
        cdot = _add(_sub(_vdot(axs, wa), _vdot(axs, wb)), p["swing_bias"])
        lam = _mul(-1.0, _mul(p["eff_swing"], cdot))
        new = jnp.maximum(_add(imp[3], lam), 0.0)
        lam = _sub(new, imp[3])
        imp[3] = new
        wa = _vadd(wa, _vscale(p["sw_to_wa"], lam))
        wb = _vsub(wb, _vscale(p["sw_to_wb"], lam))
    va, wa, vb, wb = _solve_ball_part(p, va, wa, vb, wb)
    return va, wa, vb, wb, imp


_JOINT_SOLVERS = {
    "distance": _solve_distance_row,
    "ball": _solve_ball_row,
    "fixed": _solve_fixed_row,
    "hinge": _solve_hinge_row,
    "cone_twist": _solve_cone_twist_row,
}

_JOINT_IMP_SLOTS = {"distance": 0, "ball": 0, "fixed": 0, "hinge": 2,
                    "cone_twist": 4}


def _solve_contact_row(cp, vb, wb, imp_n, imp_t):
    """solver._solve_rows for one row with a static world A side."""
    n = cp["n"]
    im_b = cp["im_b"]
    for k, pt in enumerate(cp["pts"]):
        mask = pt["mask"]
        r_b, t = pt["r_b"], pt["tangent"]

        relv = _vadd(vb, _vcross(wb, r_b))
        vt = _vdot(relv, t)
        lam = _mul(-1.0, _mul(pt["eff_t"], vt))
        max_f = _mul(cp["friction"], imp_n[k])
        new = jnp.clip(_add(imp_t[k], lam), -max_f, max_f)
        lam = jnp.where(mask, _sub(new, imp_t[k]), 0.0)
        imp_t[k] = jnp.where(mask, new, imp_t[k])
        vb = _vadd(vb, _vscale(t, _mul(im_b, lam)))
        wb = _vadd(wb, _vscale(pt["t_to_wb"], lam))

        relv = _vadd(vb, _vcross(wb, r_b))
        vn = _vdot(relv, n)
        lam = _mul(-1.0, _mul(pt["eff_n"], _sub(vn, pt["bias"])))
        new = jnp.maximum(_add(imp_n[k], lam), 0.0)
        lam = jnp.where(mask, _sub(new, imp_n[k]), 0.0)
        imp_n[k] = jnp.where(mask, new, imp_n[k])
        vb = _vadd(vb, _vscale(n, _mul(im_b, lam)))
        wb = _vadd(wb, _vscale(pt["n_to_wb"], lam))
    return vb, wb, imp_n, imp_t


# --------------------------------------------------------------------------
# Kernel assembly
# --------------------------------------------------------------------------


def _build_kernel(body, crows, contact_colors, tables, ovr_spec, dt,
                  iterations, gff, post_stage=None, n_extra=0):
    """Returns the pallas kernel fn over stacked state tiles.

    `post_stage(ctx)` optionally appends more on-chip work after velocity
    integration (e.g. the locomotion env's obs/reward/auto-reset,
    learning/loco_env.py): ctx = dict(pos/rot/vel/omega as lists of tile
    tuples, ovr = override tiles); it returns (pos, rot, vel, omega,
    extras) where extras is a list of `n_extra` scalar tiles emitted as
    one (n_extra, 8, 128) output."""
    N = body["inv_mass"].shape[0]
    n_ovr = len(ovr_spec)

    def kernel(*refs):
        in_refs = refs[:6 + n_ovr]
        if n_extra:
            out_pos, out_rot, out_vel, out_omega, out_extra = \
                refs[6 + n_ovr:]
        else:
            out_pos, out_rot, out_vel, out_omega = refs[6 + n_ovr:]
        pos_a = in_refs[0][...]
        rot_a = in_refs[1][...]
        vel_a = in_refs[2][...]
        omega_a = in_refs[3][...]
        force_a = in_refs[4][...]
        torque_a = in_refs[5][...]
        ovr_vals: Dict[Tuple[int, str], List] = {}
        for s, (tpos, key, nrows) in enumerate(ovr_spec):
            arr = in_refs[6 + s][...]
            ovr_vals[(tpos, key)] = [arr[j] for j in range(nrows)]

        pos = [tuple(pos_a[i, c] for c in range(3)) for i in range(N)]
        rot = [tuple(rot_a[i, c] for c in range(4)) for i in range(N)]
        vel = [tuple(vel_a[i, c] for c in range(3)) for i in range(N)]
        omega = [tuple(omega_a[i, c] for c in range(3)) for i in range(N)]
        force = [tuple(force_a[i, c] for c in range(3)) for i in range(N)]
        torque = [tuple(torque_a[i, c] for c in range(3)) for i in range(N)]

        # 1. Force integration (uses pre-step rotations for inertia).
        vel, omega, ii_w = _stage_forces(body, pos, rot, vel, omega,
                                         force, torque, dt, gff)

        # 2. Narrowphase + contact prep on pre-integration poses / post-force
        #    velocities (physics.cpp:1246 narrowphase before solve).
        cpreps = {}
        for r, row in enumerate(crows):
            if row is None:
                continue
            row = dict(row, lcog=tuple(float(x)
                                       for x in body["local_cog"][row["body"]]))
            manifold = _stage_narrow(row, pos, rot)
            cpreps[r] = _stage_contact_prep(row, manifold, pos, vel, omega,
                                            ii_w, body["inv_mass"], dt)

        # 3. Joint prep per table (tables pre-sorted in solve order).
        jpreps = []
        for tpos, tbl in enumerate(tables):
            rows = []
            for j, row in enumerate(tbl["rows"]):
                if row is None:
                    rows.append(None)
                    continue
                ovr = {key: vals[j] for (tp, key), vals in ovr_vals.items()
                       if tp == tpos}
                if tbl["kind"] == "distance":
                    p = _prep_distance(row, body, pos, rot, ii_w, dt)
                elif tbl["kind"] == "ball":
                    p = _prep_ball(row, body, pos, rot, ii_w, dt)
                elif tbl["kind"] == "fixed":
                    p = _prep_fixed(row, body, pos, rot, ii_w, dt)
                elif tbl["kind"] == "hinge":
                    p = _prep_hinge(row, body, pos, rot, ii_w, dt, ovr)
                else:
                    p = _prep_cone_twist(row, body, pos, rot, ii_w, dt, ovr)
                rows.append(p)
            jpreps.append(rows)

        zeros = jnp.zeros((SUBS, LANES), jnp.float32)
        crow_ids = sorted(cpreps)  # static row->carry-slot mapping
        crow_slot = {r: s for s, r in enumerate(crow_ids)}

        jimp0 = tuple(
            tuple(tuple(zeros for _ in range(
                _JOINT_IMP_SLOTS[tbl["kind"]] if row is not None else 0))
                for row in tbl["rows"])
            for tbl in tables)
        cimp0 = tuple(
            (tuple(zeros for _ in cpreps[r]["pts"]),
             tuple(zeros for _ in cpreps[r]["pts"]))
            for r in crow_ids)

        def iteration(_, carry):
            vel_t, omega_t, jimp_t, cimp_t = carry
            vel_l = list(vel_t)
            omega_l = list(omega_t)
            jimp_l = [[list(rowimp) for rowimp in tbl] for tbl in jimp_t]
            cimp_l = [(list(ni), list(ti)) for (ni, ti) in cimp_t]

            for tpos, tbl in enumerate(tables):
                solver_fn = _JOINT_SOLVERS[tbl["kind"]]
                for color in tbl["colors"]:
                    for j in color:
                        p = jpreps[tpos][j]
                        if p is None:
                            continue
                        a, b = p["a"], p["b"]
                        va, wa = vel_l[a], omega_l[a]
                        vb, wb = vel_l[b], omega_l[b]
                        imp = jimp_l[tpos][j]
                        va, wa, vb, wb, imp = solver_fn(p, va, wa, vb, wb, imp)
                        if p["im_a"] > 0.0:
                            vel_l[a], omega_l[a] = va, wa
                        if p["im_b"] > 0.0:
                            vel_l[b], omega_l[b] = vb, wb
                        jimp_l[tpos][j] = imp

            for color in contact_colors:
                for r in color:
                    cp = cpreps.get(r)
                    if cp is None:
                        continue
                    b = cp["body"]
                    imp_n, imp_t = cimp_l[crow_slot[r]]
                    vb, wb, imp_n, imp_t = _solve_contact_row(
                        cp, vel_l[b], omega_l[b], imp_n, imp_t)
                    if cp["im_b"] > 0.0:
                        vel_l[b], omega_l[b] = vb, wb
                    cimp_l[crow_slot[r]] = (imp_n, imp_t)

            return (tuple(vel_l), tuple(omega_l),
                    tuple(tuple(tuple(rowimp) for rowimp in tbl)
                          for tbl in jimp_l),
                    tuple((tuple(ni), tuple(ti)) for (ni, ti) in cimp_l))

        vel_t, omega_t, _, _ = jax.lax.fori_loop(
            0, iterations, iteration,
            (tuple(vel), tuple(omega), jimp0, cimp0))

        # 4. Velocity integration (rigid_body.cpp:126-142).
        new_pos, new_rot = [], []
        for i in range(N):
            new_pos.append(_vadd(pos[i], _vscale(vel_t[i], dt)))
            new_rot.append(_quat_integrate(rot[i], omega_t[i], dt))
        vel_out, omega_out = list(vel_t), list(omega_t)

        extras = None
        if post_stage is not None:
            new_pos, new_rot, vel_out, omega_out, extras = post_stage(dict(
                pos=new_pos, rot=new_rot, vel=vel_out, omega=omega_out,
                ovr=ovr_vals))

        def emit(vals, ncomp):
            return jnp.stack(
                [jnp.stack([_tile(v[c]) for c in range(ncomp)], 0)
                 for v in vals], 0)

        def _tile(x):
            if isinstance(x, float):
                return jnp.full((SUBS, LANES), x, jnp.float32)
            return x

        out_pos[...] = emit(new_pos, 3)
        out_rot[...] = emit(new_rot, 4)
        out_vel[...] = emit(vel_out, 3)
        out_omega[...] = emit(omega_out, 3)
        if n_extra:
            out_extra[...] = jnp.stack([_tile(x) for x in extras], 0)

    return kernel


# --------------------------------------------------------------------------
# Public entry: build the custom_vmap'd fused substep for an archetype
# --------------------------------------------------------------------------


def _should_build(settings):
    mode = getattr(settings, "fused_substep", "auto")
    if mode == "off":
        return None
    if mode == "auto" and jax.default_backend() != "tpu":
        return None
    return mode


def ovr_leaves(motor_overrides):
    """Flatten a motor_overrides tuple-of-dicts into the kernel leaf order."""
    leaves = []
    if motor_overrides is not None:
        for d in motor_overrides:
            if not d:
                continue
            for key in sorted(d):
                leaves.append(d[key])
    return leaves


def make_kernel_runner(arch, settings, dt: float, motor_overrides,
                       post_stage=None, n_extra: int = 0):
    """Build the raw batched kernel entry, or None when unsupported.

    Returns `run(state, leaves, interpret) -> (new_state, extra)` where
    `state` is a (B, ...) BodyState, `leaves` the flattened motor-override
    arrays (B, rows), and `extra` a (B, n_extra) float32 array (None when
    n_extra == 0).  Callers wrap this in their own custom_vmap (see
    make_fused_substep below and learning/loco_env.py's fused env step)."""
    if support_reason(arch, settings) is not None:
        return None
    if dt <= joints_mod.DT_THRESHOLD:
        return None

    order = {k: i for i, k in enumerate(joints_mod.JOINT_SOLVE_ORDER)}
    table_order = sorted(range(len(arch.joints)),
                         key=lambda k: order[arch.joints[k].kind])
    arch_to_pos = {k: i for i, k in enumerate(table_order)}
    ovr_spec = []   # (table_pos, key, nrows) in leaf order
    if motor_overrides is not None:
        for k, d in enumerate(motor_overrides):
            if not d:
                continue
            if not set(d) <= _OVERRIDE_KEYS:
                return None
            for key in sorted(d):
                ovr_spec.append((arch_to_pos[k], key,
                                 arch.joints[k].body_a.shape[0]))

    body, crows, contact_colors, tables = _extract_consts(arch)
    kernel = _build_kernel(body, crows, contact_colors, tables, ovr_spec, dt,
                           settings.solver_iterations,
                           tuple(float(x)
                                 for x in settings.global_force_field),
                           post_stage=post_stage, n_extra=n_extra)
    n_in = 6 + len(ovr_spec)
    N = arch.num_bodies

    def run(state, leaves, interpret):
        B = state.pos.shape[0]
        pad = (-B) % TILE_B
        arrs = [state.pos, state.rot, state.vel, state.omega,
                state.force, state.torque] + list(leaves)
        if pad:
            arrs = [jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0)
                for x in arrs]
        nblk = (B + pad) // TILE_B

        def run_block(blk):
            tiles = [_to_tiles(x) for x in blk]
            out_shape = (
                jax.ShapeDtypeStruct((N, 3, SUBS, LANES), jnp.float32),
                jax.ShapeDtypeStruct((N, 4, SUBS, LANES), jnp.float32),
                jax.ShapeDtypeStruct((N, 3, SUBS, LANES), jnp.float32),
                jax.ShapeDtypeStruct((N, 3, SUBS, LANES), jnp.float32),
            )
            if n_extra:
                out_shape += (jax.ShapeDtypeStruct(
                    (n_extra, SUBS, LANES), jnp.float32),)
            outs = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
                out_specs=tuple(
                    pl.BlockSpec(memory_space=pltpu.VMEM)
                    for _ in range(len(out_shape))),
                interpret=interpret,
            )(*tiles)
            return tuple(_from_tiles(o) for o in outs)

        if nblk == 1:
            outs = run_block(arrs)
        else:
            chunked = [x.reshape((nblk, TILE_B) + x.shape[1:]) for x in arrs]
            outs = jax.lax.map(run_block, chunked)
            outs = tuple(x.reshape((nblk * TILE_B,) + x.shape[2:])
                         for x in outs)
        outs = tuple(x[:B] for x in outs)
        pos, rot, vel, omg = outs[:4]
        new_state = state.replace(pos=pos, rot=rot, vel=vel, omega=omg,
                                  force=jnp.zeros_like(state.force),
                                  torque=jnp.zeros_like(state.torque))
        return new_state, (outs[4] if n_extra else None)

    return run


def make_fused_substep(arch, settings, dt: float, motor_overrides):
    """Returns `fused(state, motor_overrides) -> new_state`, or None when the
    archetype/settings are outside the fused kernel's scope.  The returned
    callable is per-scene; under vmap on TPU (or fused_substep="force") it
    dispatches the whole-substep Pallas kernel per 1024-env tile."""
    mode = _should_build(settings)
    if mode is None:
        return None
    run = make_kernel_runner(arch, settings, dt, motor_overrides)
    if run is None:
        return None

    def _rebuild_overrides(leaves):
        if motor_overrides is None:
            return None
        out = []
        it = iter(leaves)
        for d in motor_overrides:
            if not d:
                out.append(None)
            else:
                out.append({key: next(it) for key in sorted(d)})
        return tuple(out)

    def _fallback_one(state, *leaves):
        from . import step as step_mod
        new_state, _ = step_mod.physics_substep(
            arch, state, dt, settings,
            motor_overrides=_rebuild_overrides(list(leaves)),
            allow_fused=False)
        return new_state

    @custom_vmap
    def fused(state, *leaves):
        return _fallback_one(state, *leaves)

    @fused.def_vmap
    def fused_vmap(axis_size, in_batched, state, *leaves):
        def bcast(tree, batched):
            return jax.tree_util.tree_map(
                lambda leaf, b: leaf if b else jnp.broadcast_to(
                    leaf, (axis_size,) + leaf.shape),
                tree, batched)

        state_b = bcast(state, in_batched[0])
        leaves_b = [bcast(l, b) for l, b in zip(leaves, in_batched[1:])]
        on_tpu = jax.default_backend() == "tpu"
        if not on_tpu and mode != "force":
            out = jax.vmap(_fallback_one)(state_b, *leaves_b)
        else:
            out, _ = run(state_b, leaves_b, interpret=not on_tpu)
        batched_out = jax.tree_util.tree_map(lambda _: True, out)
        return out, batched_out

    def runner(state, mo):
        return fused(state, *ovr_leaves(mo))

    return runner
