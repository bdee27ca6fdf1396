"""Joint (non-contact) constraints: distance, ball, fixed, hinge, cone-twist, slider.

Full sequential-impulse implementations land in this module; each joint type gets
a prep + one-iteration-solve pair mirroring the reference's per-type solvers
(reference: src/physics/constraints.cpp).  Solved color-by-color like contacts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .types import SceneArchetype


def prep_all(arch: SceneArchetype, pos1, inv_mass1, inv_inertia_w1, rot, dt):
    """Precompute per-joint constraint data for all joint tables."""
    preps = []
    for table in arch.joints:
        preps.append(_PREP_FNS[table.kind](table, pos1, inv_mass1, inv_inertia_w1, rot, dt))
    return tuple(preps)


def init_impulses(arch: SceneArchetype, dtype):
    imps = []
    for table in arch.joints:
        j = table.body_a.shape[0]
        imps.append(jnp.zeros((j, _IMPULSE_DIMS[table.kind]), dtype))
    return tuple(imps)


def solve_all_one_iteration(arch: SceneArchetype, preps, impulses, vel, omega):
    new_imps = []
    for table, prep, imp in zip(arch.joints, preps, impulses):
        vel, omega, imp = _SOLVE_FNS[table.kind](table, prep, imp, vel, omega)
        new_imps.append(imp)
    return vel, omega, tuple(new_imps)


# Populated as joint types are implemented (see joints_impl.py).
_PREP_FNS = {}
_SOLVE_FNS = {}
_IMPULSE_DIMS = {}


def register_joint(kind: str, impulse_dim: int, prep_fn, solve_fn):
    _PREP_FNS[kind] = prep_fn
    _SOLVE_FNS[kind] = solve_fn
    _IMPULSE_DIMS[kind] = impulse_dim
