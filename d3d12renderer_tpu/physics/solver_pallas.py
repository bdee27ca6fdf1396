"""Pallas colored-sweep constraint solver: the entire N-iteration sequential-
impulse solve (all joint tables + contacts) as ONE TPU kernel.

Why: the XLA colored path runs ~10 gather/solve/scatter rounds per iteration
(5 cone-twist colors + 1 hinge color + 4 contact colors on the ragdoll), each
a separate tiny fusion over (batch, rows, 3) tensors.  At 30 iterations that is
~300 sequential HBM round-trips per substep — measured 184 us/iteration on a
v5e chip, 61% of the whole locomotion env step.  This kernel keeps body
velocities, prep tables and accumulated impulses resident in VMEM and runs the
full iteration loop on-chip.

Layout: the env/scene batch is the tile axis.  Every per-row scalar is an
(8, 128) float32 tile (= 1024 envs); vectors are (rows, 3, 8, 128); 3x3
matrices (rows, 3, 3, 8, 128).  All solve math is elementwise VPU work at
full lane utilization — the TPU analogue of the reference's 8-wide AVX2
constraint batches (reference: src/physics/constraints.h:12,104+), with lanes
over *scenes* instead of constraint rows.

Semantics are identical to the XLA path (joints in reference type order,
colors sequentially, 4 manifold points sequentially — reference:
src/physics/constraints.cpp:3748 solve loop); results agree to float
rounding.  Exposed through `jax.custom_batching.custom_vmap` so the per-scene
`physics_substep` code is unchanged: unbatched calls use the XLA path, vmapped
calls dispatch the batch-native kernel (on TPU) or the vmapped XLA path (CPU).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import joints as joints_mod
from . import solver as solver_mod

SUBS = 8
LANES = 128
TILE_B = SUBS * LANES  # 1024 scenes per kernel invocation

# Prep-dict fields not read by the solve functions (prep-time diagnostics).
_DROP_FIELDS = {"ia", "ib", "angle", "swing_angle", "twist_angle", "dist"}

# If the solver working set exceeds this many floats per kernel block, the
# whole-table-resident design does not fit VMEM; use the XLA path instead.
_VMEM_BUDGET_FLOATS = (12 * 1024 * 1024) // 4


# --------------------------------------------------------------------------
# Tile algebra: vectors are (rows, 3, 8, 128), scalars (rows, 8, 128).
# --------------------------------------------------------------------------

def _dot(a, b):
    return jnp.sum(a * b, axis=1)


def _cross(a, b):
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _mv(M, v):
    # (n,3,3,s,l) @ (n,3,s,l) -> (n,3,s,l)
    return jnp.sum(M * v[:, None, :], axis=2)


def _s(x):
    """Broadcast a per-row scalar over the component axis."""
    return x[:, None]


def _upd_col(x, v, col):
    """x[:, col] = v by static concat (Mosaic lowers neither scatter nor
    value-level dynamic_update_slice; all indices here are static)."""
    parts = []
    if col > 0:
        parts.append(x[:, :col])
    parts.append(v[:, None])
    if col + 1 < x.shape[1]:
        parts.append(x[:, col + 1:])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else v[:, None]


# --------------------------------------------------------------------------
# Per-type solve functions (tile layout) — mirror joints.py line for line.
# --------------------------------------------------------------------------

def _t_apply_linear3(prep, P, va, wa, vb, wb):
    va = va - _s(prep["im_a"]) * P
    wa = wa - _mv(prep["ii_a"], _cross(prep["ra"], P))
    vb = vb + _s(prep["im_b"]) * P
    wb = wb + _mv(prep["ii_b"], _cross(prep["rb"], P))
    return va, wa, vb, wb


def _t_solve_distance(prep, va, wa, vb, wb, imp):
    av_a = va + _cross(wa, prep["ra"])
    av_b = vb + _cross(wb, prep["rb"])
    cdot = _dot(prep["u"], av_b - av_a) + prep["bias"]
    lam = -prep["eff"] * cdot
    P = _s(lam) * prep["u"]
    va = va - _s(prep["im_a"]) * P
    wa = wa - prep["to_wa"] * _s(lam)
    vb = vb + _s(prep["im_b"]) * P
    wb = wb + prep["to_wb"] * _s(lam)
    return va, wa, vb, wb, imp


def _t_solve_ball_part(prep, va, wa, vb, wb):
    av_a = va + _cross(wa, prep["ra"])
    av_b = vb + _cross(wb, prep["rb"])
    cdot = av_b - av_a + prep["bias"]
    P = -_mv(prep["inv_K"], cdot)
    return _t_apply_linear3(prep, P, va, wa, vb, wb)


def _t_solve_ball(prep, va, wa, vb, wb, imp):
    va, wa, vb, wb = _t_solve_ball_part(prep, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _t_solve_fixed(prep, va, wa, vb, wb, imp):
    lam = -_mv(prep["inv_K_rot"], (wb - wa) + prep["r_bias"])
    wa = wa - _mv(prep["ii_a"], lam)
    wb = wb + _mv(prep["ii_b"], lam)
    va, wa, vb, wb = _t_solve_ball_part(prep, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _t_solve_axial_motor(prep, wa, wb, imp, slot):
    relw = _dot(prep["axis"], wb) - _dot(prep["axis"], wa)
    cdot = relw - prep["motor_vel"]
    lam = -prep["eff_motor"] * cdot
    new = jnp.clip(imp[:, slot] + lam, -prep["max_imp"], prep["max_imp"])
    lam = new - imp[:, slot]
    imp = _upd_col(imp, new, slot)
    wa = wa - prep["to_wa_ax"] * _s(lam)
    wb = wb + prep["to_wb_ax"] * _s(lam)
    return wa, wb, imp


def _t_solve_axial_limit(prep, wa, wb, imp, slot):
    sgn = prep["limit_sign"]
    relw = sgn * (_dot(prep["axis"], wb) - _dot(prep["axis"], wa))
    cdot = relw + prep["limit_bias"]
    lam = -prep["eff_limit"] * cdot
    new = jnp.maximum(imp[:, slot] + lam, 0.0)
    lam = (new - imp[:, slot]) * sgn
    imp = _upd_col(imp, new, slot)
    wa = wa - prep["to_wa_ax"] * _s(lam)
    wb = wb + prep["to_wb_ax"] * _s(lam)
    return wa, wb, imp


def _t_solve_hinge(prep, va, wa, vb, wb, imp):
    # Order (reference: constraints.cpp:1240): motor -> limit -> rotation -> position.
    wa, wb, imp = _t_solve_axial_motor(prep, wa, wb, imp, 0)
    wa, wb, imp = _t_solve_axial_limit(prep, wa, wb, imp, 1)

    dw = wb - wa
    c0 = _dot(prep["bxa"], dw) + prep["r_bias"][:, 0]
    c1 = _dot(prep["cxa"], dw) + prep["r_bias"][:, 1]
    i00, i01, i10, i11 = prep["i2"]
    l0 = -(i00 * c0 + i01 * c1)
    l1 = -(i10 * c0 + i11 * c1)
    P = prep["bxa"] * _s(l0) + prep["cxa"] * _s(l1)
    wa = wa - _mv(prep["ii_a"], P)
    wb = wb + _mv(prep["ii_b"], P)

    va, wa, vb, wb = _t_solve_ball_part(prep, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _t_solve_cone_twist(prep, va, wa, vb, wb, imp):
    # Order (reference: constraints.cpp:1986): twist motor -> swing motor ->
    # twist limit -> swing limit -> position.
    ax = prep["twist_axis"]
    relw = _dot(ax, wb) - _dot(ax, wa)
    lam = -prep["eff_twist_motor"] * (relw - prep["twist_motor_vel"])
    new = jnp.clip(imp[:, 0] + lam, -prep["max_twist_imp"], prep["max_twist_imp"])
    lam = new - imp[:, 0]
    imp = _upd_col(imp, new, 0)
    wa = wa - prep["tw_to_wa"] * _s(lam)
    wb = wb + prep["tw_to_wb"] * _s(lam)

    axm = prep["swing_motor_axis"]
    relw = _dot(axm, wb) - _dot(axm, wa)
    lam = -prep["eff_swing_motor"] * (relw - prep["swing_motor_vel"])
    new = jnp.clip(imp[:, 1] + lam, -prep["max_swing_imp"], prep["max_swing_imp"])
    lam = new - imp[:, 1]
    imp = _upd_col(imp, new, 1)
    wa = wa - prep["swm_to_wa"] * _s(lam)
    wb = wb + prep["swm_to_wb"] * _s(lam)

    sgn = prep["twist_sign"]
    relw = sgn * (_dot(ax, wb) - _dot(ax, wa))
    lam = -prep["eff_twist_limit"] * (relw + prep["twist_bias"])
    new = jnp.maximum(imp[:, 2] + lam, 0.0)
    lam = (new - imp[:, 2]) * sgn
    imp = _upd_col(imp, new, 2)
    wa = wa - prep["tw_to_wa"] * _s(lam)
    wb = wb + prep["tw_to_wb"] * _s(lam)

    # Swing limit — inverted application sign
    # (reference: constraints.cpp:2035-2048 swing Cdot = aDotWA - aDotWB).
    axs = prep["swing_axis"]
    cdot = _dot(axs, wa) - _dot(axs, wb) + prep["swing_bias"]
    lam = -prep["eff_swing"] * cdot
    new = jnp.maximum(imp[:, 3] + lam, 0.0)
    lam = new - imp[:, 3]
    imp = _upd_col(imp, new, 3)
    wa = wa + prep["sw_to_wa"] * _s(lam)
    wb = wb - prep["sw_to_wb"] * _s(lam)

    va, wa, vb, wb = _t_solve_ball_part(prep, va, wa, vb, wb)
    return va, wa, vb, wb, imp


def _t_solve_slider(prep, va, wa, vb, wb, imp):
    ax = prep["axis"]

    # Motor (linear, no angular arms).
    cdot = _dot(ax, vb) - _dot(ax, va) - prep["motor_vel"]
    lam = -prep["eff_motor"] * cdot
    new = jnp.clip(imp[:, 0] + lam, -prep["max_imp"], prep["max_imp"])
    lam = new - imp[:, 0]
    imp = _upd_col(imp, new, 0)
    P = _s(lam) * ax
    va = va - _s(prep["im_a"]) * P
    vb = vb + _s(prep["im_b"]) * P

    # Limit.
    sgn = prep["limit_sign"]
    cdot = (
        _dot(vb, ax) + _dot(wb, prep["rbxs"])
        - _dot(va, ax) - _dot(wa, prep["rauxs"])
    )
    lam = -prep["eff_limit"] * (sgn * cdot + prep["limit_bias"])
    new = jnp.maximum(imp[:, 1] + lam, 0.0)
    lam = (new - imp[:, 1]) * sgn
    imp = _upd_col(imp, new, 1)
    P = _s(lam) * ax
    va = va - _s(prep["im_a"]) * P
    wa = wa - prep["lim_to_wa"] * _s(lam)
    vb = vb + _s(prep["im_b"]) * P
    wb = wb + prep["lim_to_wb"] * _s(lam)

    # Rotation part (all 3 angular dof locked).
    lam3 = -_mv(prep["inv_K_rot"], (wb - wa) + prep["r_bias"])
    wa = wa - _mv(prep["ii_a"], lam3)
    wb = wb + _mv(prep["ii_b"], lam3)

    # Position part (2 dof perpendicular to axis).
    t, b = prep["t"], prep["b"]
    c0 = (
        _dot(t, vb) + _dot(prep["rbxt"], wb)
        - _dot(t, va) - _dot(prep["rauxt"], wa)
        + prep["t_bias"][:, 0]
    )
    c1 = (
        _dot(b, vb) + _dot(prep["rbxb"], wb)
        - _dot(b, va) - _dot(prep["rauxb"], wa)
        + prep["t_bias"][:, 1]
    )
    i00, i01, i10, i11 = prep["i2"]
    l0 = -(i00 * c0 + i01 * c1)
    l1 = -(i10 * c0 + i11 * c1)
    P = t * _s(l0) + b * _s(l1)
    va = va - _s(prep["im_a"]) * P
    wa = wa - _mv(prep["ii_a"], prep["rauxt"] * _s(l0) + prep["rauxb"] * _s(l1))
    vb = vb + _s(prep["im_b"]) * P
    wb = wb + _mv(prep["ii_b"], prep["rbxt"] * _s(l0) + prep["rbxb"] * _s(l1))

    return va, wa, vb, wb, imp


_T_SOLVE_FNS = {
    "distance": _t_solve_distance,
    "ball": _t_solve_ball,
    "fixed": _t_solve_fixed,
    "hinge": _t_solve_hinge,
    "cone_twist": _t_solve_cone_twist,
    "slider": _t_solve_slider,
}


def _t_solve_contact_color(prep, va, wa, vb, wb, imp_n, imp_t,
                           a_static: bool, b_static: bool):
    """4 manifold points sequentially; mirrors solver._solve_rows.

    When one side is statically massless for every row of the table (e.g. all
    contacts vs the world plane), its velocity registers are identically zero
    and its updates are skipped."""
    num_pts = imp_n.shape[1]
    n = prep["normal"]
    for k in range(num_pts):
        mask = prep["pmask"][:, k] > 0.5
        r_b = prep["r_b"][:, k]
        r_a = None if a_static else prep["r_a"][:, k]
        t = prep["tangent"][:, k]

        # Tangent (friction) first.
        av_b = vb + _cross(wb, r_b)
        av_a = va if a_static else va + _cross(wa, r_a)
        relv = av_b - av_a
        vt = _dot(relv, t)
        lam = -prep["eff_mass_t"][:, k] * vt
        max_f = prep["friction"] * imp_n[:, k]
        new = jnp.clip(imp_t[:, k] + lam, -max_f, max_f)
        lam = jnp.where(mask, new - imp_t[:, k], 0.0)
        imp_t = _upd_col(imp_t, jnp.where(mask, new, imp_t[:, k]), k)
        P = _s(lam) * t
        if not a_static:
            va = va - _s(prep["inv_mass_a"]) * P
            wa = wa - prep["t_to_wa"][:, k] * _s(lam)
        if not b_static:
            vb = vb + _s(prep["inv_mass_b"]) * P
            wb = wb + prep["t_to_wb"][:, k] * _s(lam)

        # Normal.
        av_b = vb + _cross(wb, r_b)
        av_a = va if a_static else va + _cross(wa, r_a)
        relv = av_b - av_a
        vn = _dot(relv, n)
        lam = -prep["eff_mass_n"][:, k] * (vn - prep["bias"][:, k])
        new = jnp.maximum(imp_n[:, k] + lam, 0.0)
        lam = jnp.where(mask, new - imp_n[:, k], 0.0)
        imp_n = _upd_col(imp_n, jnp.where(mask, new, imp_n[:, k]), k)
        P = _s(lam) * n
        if not a_static:
            va = va - _s(prep["inv_mass_a"]) * P
            wa = wa - prep["n_to_wa"][:, k] * _s(lam)
        if not b_static:
            vb = vb + _s(prep["inv_mass_b"]) * P
            wb = wb + prep["n_to_wb"][:, k] * _s(lam)

    return va, wa, vb, wb, imp_n, imp_t


# --------------------------------------------------------------------------
# Layout transforms (outside the kernel)
# --------------------------------------------------------------------------

def _to_tiles(x):
    """(TILE_B, rows, *comp) -> (rows, *comp, SUBS, LANES)."""
    x = x.reshape((SUBS, LANES) + x.shape[1:])
    perm = tuple(range(2, x.ndim)) + (0, 1)
    return jnp.transpose(x, perm)


def _from_tiles(x):
    """(rows, *comp, SUBS, LANES) -> (TILE_B, rows, *comp)."""
    perm = (x.ndim - 2, x.ndim - 1) + tuple(range(x.ndim - 2))
    return jnp.transpose(x, perm).reshape((TILE_B,) + x.shape[:-2])


# --------------------------------------------------------------------------
# Static metadata
# --------------------------------------------------------------------------

class _TableMeta:
    """Static structure of one table: color layout + body ids + impulse dim."""

    def __init__(self, kind: str, colors, body_a: np.ndarray,
                 body_b: np.ndarray, imp_dim: int, arch_index: int = -1):
        self.kind = kind
        self.arch_index = arch_index
        self.imp_dim = imp_dim
        colors = [np.asarray(c) for c in colors]
        self.perm = (np.concatenate(colors).astype(np.int32)
                     if colors else np.zeros((0,), np.int32))
        self.colors = []
        start = 0
        for c in colors:
            self.colors.append((
                start, start + len(c),
                body_a[c].astype(int), body_b[c].astype(int),
            ))
            start += len(c)
        self.treedef = None  # set when prep leaves are flattened
        self.a_static = False
        self.b_static = False


def _gather_rows(table, ids):
    """Stack static body rows out of the (slots, 3, s, l) velocity tensor."""
    return jnp.stack([table[int(i)] for i in ids], axis=0)


def _scatter_rows_ref(ref, ids, values, dynamic):
    """Store solved rows back into the VMEM body-table ref (static indices)."""
    for j, i in enumerate(ids):
        if dynamic[int(i)]:
            ref[int(i)] = values[j]


def _gather_rows_ref(ref, ids):
    return jnp.stack([ref[int(i)] for i in ids], axis=0)


# --------------------------------------------------------------------------
# Builder
# --------------------------------------------------------------------------

def make_colored_solver(arch, num_pairs: int, iterations: int,
                        backend: str = "auto"):
    """Build `solve(joint_preps, contact_prep, vel1, omega1) -> (vel1, omega1)`.

    Per-scene callable; under `jax.vmap` it dispatches the batch-native Pallas
    kernel on TPU (vmapped XLA path elsewhere).  `contact_prep` may be None
    (then `num_pairs` must be 0).  `backend`: "auto" = Pallas on TPU only,
    "pallas" = always (interpret mode off-TPU, for tests), "xla" = never.
    """
    inv_mass_np = np.asarray(jax.device_get(arch.inv_mass))
    dynamic = inv_mass_np > 0.0

    order = {k: i for i, k in enumerate(joints_mod.JOINT_SOLVE_ORDER)}
    table_order = sorted(range(len(arch.joints)),
                         key=lambda k: order[arch.joints[k].kind])
    tables: List[_TableMeta] = []
    for k in table_order:
        t = arch.joints[k]
        tables.append(_TableMeta(
            t.kind, list(arch.joint_color_indices[k]),
            np.asarray(jax.device_get(t.body_a)),
            np.asarray(jax.device_get(t.body_b)),
            joints_mod.IMPULSE_DIMS[t.kind], arch_index=k,
        ))

    contact_meta: Optional[_TableMeta] = None
    if num_pairs > 0:
        # Candidate-pair body ids are static archetype structure; replicate
        # collide.generate_contacts' row order (plane rows, terrain rows,
        # then buckets) from the concrete archetype tables.
        world = arch.world_body
        ia_parts, ib_parts = [], []
        if arch.vs_plane_collider.shape[0] > 0:
            b = np.asarray(jax.device_get(arch.vs_plane_body))
            ia_parts.append(np.full_like(b, world))
            ib_parts.append(b)
        if arch.vs_terrain_collider.shape[0] > 0:
            b = np.asarray(jax.device_get(arch.vs_terrain_body))
            ia_parts.append(np.full_like(b, world))
            ib_parts.append(b)
        for bucket in arch.contact_buckets:
            ia_parts.append(np.asarray(jax.device_get(bucket.body_a)))
            ib_parts.append(np.asarray(jax.device_get(bucket.body_b)))
        ia = np.concatenate(ia_parts).astype(int)
        ib = np.concatenate(ib_parts).astype(int)
        assert ia.shape[0] == num_pairs, (ia.shape, num_pairs)
        contact_meta = _TableMeta(
            "contact", list(arch.contact_color_indices), ia, ib, 0)
        contact_meta.a_static = bool(np.all(~dynamic[ia]))
        contact_meta.b_static = bool(np.all(~dynamic[ib]))

    def fallback(joint_preps, contact_prep, vel1, omega1):
        """Per-scene XLA path — identical to the original fori_loop body."""
        imp_n = jnp.zeros((num_pairs, 4), vel1.dtype)
        imp_t = jnp.zeros((num_pairs, 4), vel1.dtype)
        joint_impulses = joints_mod.init_impulses(arch, vel1.dtype)

        def one_iteration(_, carry):
            vel1, omega1, imp_n, imp_t, joint_impulses = carry
            vel1, omega1, joint_impulses = joints_mod.solve_all_one_iteration(
                arch, joint_preps, joint_impulses, vel1, omega1
            )
            if contact_prep is not None:
                vel1, omega1, imp_n, imp_t = solver_mod.solve_contacts_colored(
                    contact_prep, arch.contact_color_indices,
                    vel1, omega1, imp_n, imp_t,
                )
            return vel1, omega1, imp_n, imp_t, joint_impulses

        vel1, omega1, _, _, _ = jax.lax.fori_loop(
            0, iterations, one_iteration,
            (vel1, omega1, imp_n, imp_t, joint_impulses),
        )
        return vel1, omega1

    def _bcast(tree, batched, axis_size):
        def go(leaf, b):
            return leaf if b else jnp.broadcast_to(
                leaf, (axis_size,) + leaf.shape)
        return jax.tree_util.tree_map(go, tree, batched)

    def _prep_leaves(joint_preps, contact_prep):
        """Filter + color-sort the batched prep pytrees into flat leaf lists."""
        jp_leaves = []
        for meta in tables:
            prep = joint_preps[meta.arch_index]
            d = {k: v for k, v in prep.items() if k not in _DROP_FIELDS}
            d = jax.tree_util.tree_map(lambda x: x[:, meta.perm], d)
            leaves, meta.treedef = jax.tree_util.tree_flatten(d)
            jp_leaves.append(leaves)

        cp_leaves = []
        if contact_prep is not None:
            m = contact_meta
            d = dict(
                normal=contact_prep.normal, r_b=contact_prep.r_b,
                tangent=contact_prep.tangent, bias=contact_prep.bias,
                eff_mass_n=contact_prep.eff_mass_n,
                eff_mass_t=contact_prep.eff_mass_t,
                inv_mass_b=contact_prep.inv_mass_b,
                n_to_wb=contact_prep.n_to_wb, t_to_wb=contact_prep.t_to_wb,
                friction=contact_prep.friction,
                pmask=contact_prep.pmask.astype(jnp.float32),
            )
            if not m.a_static:
                d.update(
                    r_a=contact_prep.r_a, inv_mass_a=contact_prep.inv_mass_a,
                    n_to_wa=contact_prep.n_to_wa, t_to_wa=contact_prep.t_to_wa,
                )
            d = jax.tree_util.tree_map(lambda x: x[:, m.perm], d)
            cp_leaves, m.treedef = jax.tree_util.tree_flatten(d)
        return jp_leaves, cp_leaves

    def _solve_batched(joint_preps, contact_prep, vel1, omega1, interpret):
        B = vel1.shape[0]
        pad = (-B) % TILE_B
        if pad:
            padfn = lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0)
            joint_preps = jax.tree_util.tree_map(padfn, joint_preps)
            contact_prep = jax.tree_util.tree_map(padfn, contact_prep)
            vel1, omega1 = padfn(vel1), padfn(omega1)
        nblk = (B + pad) // TILE_B

        jp_leaves, cp_leaves = _prep_leaves(joint_preps, contact_prep)
        flat = [vel1, omega1]
        counts = []
        for leaves in jp_leaves:
            counts.append(len(leaves))
            flat += leaves
        n_cp = len(cp_leaves)
        flat += cp_leaves

        kernel = _build_kernel(
            tables, contact_meta if n_cp else None, counts, n_cp,
            dynamic, iterations,
        )

        scratch = [
            pltpu.VMEM((m.perm.shape[0], m.imp_dim, SUBS, LANES), jnp.float32)
            for m in tables if m.imp_dim > 0
        ]
        if n_cp:
            P = contact_meta.perm.shape[0]
            scratch += [pltpu.VMEM((P, 4, SUBS, LANES), jnp.float32)] * 2

        def run_block(leaves):
            tiles = [_to_tiles(x) for x in leaves]
            out_shapes = (
                jax.ShapeDtypeStruct(tiles[0].shape, tiles[0].dtype),
                jax.ShapeDtypeStruct(tiles[1].shape, tiles[1].dtype),
            )
            v_t, w_t = pl.pallas_call(
                kernel,
                out_shape=out_shapes,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tiles),
                out_specs=(
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                scratch_shapes=scratch,
                interpret=interpret,
            )(*tiles)
            return _from_tiles(v_t), _from_tiles(w_t)

        if nblk == 1:
            v, w = run_block(flat)
        else:
            chunked = [x.reshape((nblk, TILE_B) + x.shape[1:]) for x in flat]
            v, w = jax.lax.map(run_block, chunked)
            v = v.reshape((nblk * TILE_B,) + v.shape[2:])
            w = w.reshape((nblk * TILE_B,) + w.shape[2:])
        return v[:B], w[:B]

    @custom_vmap
    def solve(joint_preps, contact_prep, vel1, omega1):
        return fallback(joint_preps, contact_prep, vel1, omega1)

    @solve.def_vmap
    def solve_vmap(axis_size, in_batched, joint_preps, contact_prep,
                   vel1, omega1):
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = backend == "pallas" or (backend == "auto" and on_tpu)

        jp = _bcast(joint_preps, in_batched[0], axis_size)
        cp = _bcast(contact_prep, in_batched[1], axis_size)
        v = _bcast(vel1, in_batched[2], axis_size)
        w = _bcast(omega1, in_batched[3], axis_size)

        if use_pallas:
            per_env = sum(
                int(np.prod(leaf.shape[1:]))
                for tree in (jp, cp)
                for leaf in jax.tree_util.tree_leaves(tree)
            )
            if per_env * TILE_B > _VMEM_BUDGET_FLOATS:
                use_pallas = False

        if not use_pallas:
            out = jax.vmap(fallback)(jp, cp, v, w)
        else:
            out = _solve_batched(jp, cp, v, w, interpret=not on_tpu)
        return out, (True, True)

    return solve


def _build_kernel(tables, contact_meta, counts, n_cp, dynamic, iterations):
    """Assemble the kernel body.

    Body velocities live in the OUTPUT refs and accumulated impulses in VMEM
    scratch refs — Mosaic supports static indexed loads/stores on refs, which
    is exactly the colored gather/solve/scatter access pattern.  Per-slot
    impulse updates inside the row solvers stay value-level via static
    concatenation (`_upd_col`)."""

    def kernel(*refs):
        n_scratch = len(tables_with_imp(tables)) + (
            2 if contact_meta is not None else 0)
        in_refs = refs[:-(2 + n_scratch)]
        out_v, out_w = refs[-(2 + n_scratch):-n_scratch] if n_scratch else refs[-2:]
        scratch = refs[len(refs) - n_scratch:] if n_scratch else ()
        jimp_refs = scratch[:len(tables_with_imp(tables))]
        cimp_refs = scratch[len(tables_with_imp(tables)):]

        pos = 2
        jpreps = []
        for meta, c in zip(tables, counts):
            leaves = [in_refs[pos + i][...] for i in range(c)]
            pos += c
            jpreps.append(jax.tree_util.tree_unflatten(meta.treedef, leaves))
        cprep = None
        if contact_meta is not None:
            leaves = [in_refs[pos + i][...] for i in range(n_cp)]
            cprep = jax.tree_util.tree_unflatten(contact_meta.treedef, leaves)

        # Initialize mutable state.
        out_v[...] = in_refs[0][...]
        out_w[...] = in_refs[1][...]
        for r in scratch:
            r[...] = jnp.zeros(r.shape, r.dtype)

        def iteration(it, carry):
            ji = 0
            for meta, prep in zip(tables, jpreps):
                fn = _T_SOLVE_FNS[meta.kind]
                has_imp = meta.imp_dim > 0
                for (s, e, ia, ib) in meta.colors:
                    p = jax.tree_util.tree_map(lambda x: x[s:e], prep)
                    va = _gather_rows_ref(out_v, ia)
                    wa = _gather_rows_ref(out_w, ia)
                    vb = _gather_rows_ref(out_v, ib)
                    wb = _gather_rows_ref(out_w, ib)
                    imp_c = jimp_refs[ji][s:e] if has_imp else None
                    va, wa, vb, wb, imp_c = fn(p, va, wa, vb, wb, imp_c)
                    if has_imp:
                        jimp_refs[ji][s:e] = imp_c
                    _scatter_rows_ref(out_v, ia, va, dynamic)
                    _scatter_rows_ref(out_w, ia, wa, dynamic)
                    _scatter_rows_ref(out_v, ib, vb, dynamic)
                    _scatter_rows_ref(out_w, ib, wb, dynamic)
                if has_imp:
                    ji += 1

            if contact_meta is not None:
                m = contact_meta
                imp_n_ref, imp_t_ref = cimp_refs
                for (s, e, ia, ib) in m.colors:
                    p = jax.tree_util.tree_map(lambda x: x[s:e], cprep)
                    zero = jnp.zeros((e - s, 3, SUBS, LANES), out_v.dtype)
                    va = zero if m.a_static else _gather_rows_ref(out_v, ia)
                    wa = zero if m.a_static else _gather_rows_ref(out_w, ia)
                    vb = zero if m.b_static else _gather_rows_ref(out_v, ib)
                    wb = zero if m.b_static else _gather_rows_ref(out_w, ib)
                    va, wa, vb, wb, inew, tnew = _t_solve_contact_color(
                        p, va, wa, vb, wb, imp_n_ref[s:e], imp_t_ref[s:e],
                        m.a_static, m.b_static,
                    )
                    imp_n_ref[s:e] = inew
                    imp_t_ref[s:e] = tnew
                    if not m.a_static:
                        _scatter_rows_ref(out_v, ia, va, dynamic)
                        _scatter_rows_ref(out_w, ia, wa, dynamic)
                    if not m.b_static:
                        _scatter_rows_ref(out_v, ib, vb, dynamic)
                        _scatter_rows_ref(out_w, ib, wb, dynamic)
            return carry

        jax.lax.fori_loop(0, iterations, iteration, 0)

    return kernel


def tables_with_imp(tables):
    return [m for m in tables if m.imp_dim > 0]
