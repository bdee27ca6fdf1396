"""Host-side scene construction: authoring API -> compiled SceneArchetype.

Replaces the reference's EnTT component hooks: `addComponent<collider_component>`
registering colliders in a per-entity linked list and
`rigid_body_component::recalculateProperties` aggregating mass/inertia/COG from
the collider list (reference: src/scene/scene.h:38-84,
src/physics/rigid_body.cpp:29-93).  Here the same authoring flow runs once on the
host and compiles fixed-shape SoA tables, candidate contact-pair buckets, and a
greedy graph coloring for conflict-free parallel constraint solving (the
compile-time analogue of the reference's runtime SIMD batch scheduling,
src/physics/constraints.cpp: scheduleConstraintsSIMD).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .types import (
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_CYLINDER,
    SHAPE_HULL,
    SHAPE_SPHERE,
    BodyState,
    ContactBucket,
    JointTable,
    SceneArchetype,
)

_IDENTITY_QUAT = np.array([0.0, 0.0, 0.0, 1.0], np.float32)


@dataclass
class _Collider:
    body: int
    shape: int
    local_pos: np.ndarray
    local_rot: np.ndarray
    size: np.ndarray
    density: float
    friction: float
    restitution: float
    hull_verts: Optional[np.ndarray] = None  # (V, 3), collider frame


@dataclass
class _Body:
    pos: np.ndarray
    rot: np.ndarray
    kinematic: bool
    mass_override: Optional[float]
    gravity_factor: float
    linear_damping: float
    angular_damping: float
    colliders: List[int] = field(default_factory=list)
    # collision filtering: bodies sharing a group never collide with each other
    no_collide_group: int = -1


@dataclass
class _Joint:
    kind: str
    body_a: int
    body_b: int
    params: Dict[str, np.ndarray]
    # Reference parity: the reference DOES collide jointed bodies unless they
    # share a no-collide group (src/physics/physics.cpp constraint adds place
    # no such exclusion).  Our default excludes them (standard ragdoll
    # behavior, documented divergence); pass collide_connected=True on
    # add_joint for exact reference semantics.
    collide_connected: bool = False


def _hull_mass_properties(verts: np.ndarray, rho: float):
    """Exact convex-polyhedron mass properties via tetrahedron decomposition
    (covariance form).  Returns (mass, inertia 3x3 about COG, COG)."""
    from scipy.spatial import ConvexHull

    hull = ConvexHull(verts.astype(np.float64))
    v = verts.astype(np.float64)
    volume = 0.0
    com = np.zeros(3)
    C = np.zeros((3, 3))
    for simplex, eq in zip(hull.simplices, hull.equations):
        a, b_, c_ = v[simplex[0]], v[simplex[1]], v[simplex[2]]
        n = np.cross(b_ - a, c_ - a)
        if n @ eq[:3] < 0:  # orient outward
            b_, c_ = c_, b_
        det = np.linalg.det(np.stack([a, b_, c_], axis=1))
        volume += det / 6.0
        com += det / 24.0 * (a + b_ + c_)
        s = a + b_ + c_
        C += det / 120.0 * (
            np.outer(a, a) + np.outer(b_, b_) + np.outer(c_, c_) + np.outer(s, s)
        )
    mass = rho * volume
    com = com / volume if volume > 1e-12 else np.zeros(3)
    C *= rho
    inertia_origin = np.trace(C) * np.eye(3) - C
    d = com
    inertia_com = inertia_origin - mass * ((d @ d) * np.eye(3) - np.outer(d, d))
    return mass, inertia_com, com


def _shape_mass_properties(c: _Collider):
    """(mass, local inertia diag about shape COG, shape COG in collider frame).

    Standard rigid-body formulas, matching the reference's per-collider
    calculatePhysicsProperties (reference: src/physics/physics.cpp:58)."""
    rho = c.density
    if c.shape == SHAPE_HULL:
        mass, inertia, com = _hull_mass_properties(c.hull_verts, rho)
        return mass, inertia, com
    if c.shape == SHAPE_SPHERE:
        r = float(c.size[0])
        mass = rho * 4.0 / 3.0 * math.pi * r ** 3
        i = 2.0 / 5.0 * mass * r * r
        return mass, np.array([i, i, i]), np.zeros(3)
    if c.shape == SHAPE_BOX:
        hx, hy, hz = (float(s) for s in c.size)
        mass = rho * 8.0 * hx * hy * hz
        ix = mass / 3.0 * (hy * hy + hz * hz)
        iy = mass / 3.0 * (hx * hx + hz * hz)
        iz = mass / 3.0 * (hx * hx + hy * hy)
        return mass, np.array([ix, iy, iz]), np.zeros(3)
    if c.shape == SHAPE_CYLINDER:
        r, hh = float(c.size[0]), float(c.size[1])
        h = 2.0 * hh
        mass = rho * math.pi * r * r * h
        iy = 0.5 * mass * r * r
        ix = mass / 12.0 * (3 * r * r + h * h)
        return mass, np.array([ix, iy, ix]), np.zeros(3)
    if c.shape == SHAPE_CAPSULE:
        r, hh = float(c.size[0]), float(c.size[1])
        h = 2.0 * hh
        m_cyl = rho * math.pi * r * r * h
        m_hemi = rho * 2.0 / 3.0 * math.pi * r ** 3
        mass = m_cyl + 2 * m_hemi
        # cylinder part
        iy = 0.5 * m_cyl * r * r
        ix = m_cyl / 12.0 * (3 * r * r + h * h)
        # hemisphere parts (about capsule center, axis = Y)
        i_hemi_y = 2.0 / 5.0 * m_hemi * r * r
        # hemisphere COM is 3r/8 above flat face; parallel-axis to capsule center
        d = hh + 3.0 * r / 8.0
        i_hemi_x = 2.0 / 5.0 * m_hemi * r * r + m_hemi * d * d
        iy += 2 * i_hemi_y
        ix += 2 * i_hemi_x
        return mass, np.array([ix, iy, ix]), np.zeros(3)
    raise NotImplementedError(f"mass properties for shape {c.shape}")


def _quat_to_mat(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class SceneBuilder:
    """Authoring API.  Usage:

        b = SceneBuilder()
        b.add_static_plane((0, 1, 0), 0.0)
        body = b.add_body(position=(0, 5, 0))
        b.add_sphere_collider(body, radius=0.5, density=1000.0)
        arch, state0 = b.finalize()
    """

    def __init__(self):
        self.bodies: List[_Body] = []
        self.colliders: List[_Collider] = []
        self.planes: List[Tuple[np.ndarray, float, float, float]] = []
        self.terrains: List[Tuple[np.ndarray, np.ndarray, float, float, float]] = []
        self.joints: List[_Joint] = []
        self.force_fields: List[Tuple[np.ndarray, float, np.ndarray]] = []
        self.triggers: List[Tuple[np.ndarray, float]] = []
        self._no_collide_groups = 0

    # -- bodies ------------------------------------------------------------

    def add_body(
        self,
        position=(0.0, 0.0, 0.0),
        rotation=None,
        kinematic=False,
        mass=None,
        gravity_factor=1.0,
        linear_damping=0.4,
        angular_damping=0.4,
    ) -> int:
        """Defaults match reference rigid_body_component defaults
        (reference: src/physics/physics.h rigid_body ctor args 0.4 damping)."""
        rot = np.asarray(rotation, np.float32) if rotation is not None else _IDENTITY_QUAT.copy()
        self.bodies.append(
            _Body(
                pos=np.asarray(position, np.float32),
                rot=rot,
                kinematic=kinematic,
                mass_override=mass,
                gravity_factor=gravity_factor,
                linear_damping=linear_damping,
                angular_damping=angular_damping,
            )
        )
        return len(self.bodies) - 1

    def new_no_collide_group(self) -> int:
        self._no_collide_groups += 1
        return self._no_collide_groups - 1

    def set_no_collide_group(self, body: int, group: int):
        self.bodies[body].no_collide_group = group

    # -- colliders ---------------------------------------------------------

    def _add_collider(self, body, shape, local_pos, local_rot, size,
                      density, friction, restitution) -> int:
        self.colliders.append(
            _Collider(
                body=body,
                shape=shape,
                local_pos=np.asarray(local_pos, np.float32),
                local_rot=np.asarray(local_rot, np.float32),
                size=np.asarray(size, np.float32),
                density=density,
                friction=friction,
                restitution=restitution,
            )
        )
        if body >= 0:
            self.bodies[body].colliders.append(len(self.colliders) - 1)
        return len(self.colliders) - 1

    def add_sphere_collider(self, body, radius, center=(0, 0, 0),
                            density=1000.0, friction=0.5, restitution=0.0):
        return self._add_collider(
            body, SHAPE_SPHERE, center, _IDENTITY_QUAT, (radius, 0, 0),
            density, friction, restitution,
        )

    def add_capsule_collider(self, body, radius, half_length, center=(0, 0, 0),
                             rotation=None, density=1000.0, friction=0.5,
                             restitution=0.0):
        rot = np.asarray(rotation, np.float32) if rotation is not None else _IDENTITY_QUAT
        return self._add_collider(
            body, SHAPE_CAPSULE, center, rot, (radius, half_length, 0),
            density, friction, restitution,
        )

    def add_box_collider(self, body, half_extents, center=(0, 0, 0), rotation=None,
                         density=1000.0, friction=0.5, restitution=0.0):
        rot = np.asarray(rotation, np.float32) if rotation is not None else _IDENTITY_QUAT
        return self._add_collider(
            body, SHAPE_BOX, center, rot, half_extents,
            density, friction, restitution,
        )

    def add_capsule_collider_from_points(self, body, point_a, point_b, radius,
                                         density=1000.0, friction=0.5,
                                         restitution=0.0):
        """Capsule specified by its two hemisphere centers in body-local frame
        (the reference's capsule authoring style: collider_component::asCapsule
        {positionA, positionB, radius})."""
        a = np.asarray(point_a, np.float64)
        c = np.asarray(point_b, np.float64)
        center = 0.5 * (a + c)
        d = c - a
        l = np.linalg.norm(d)
        if l < 1e-9:
            rot = _IDENTITY_QUAT
            half = 0.0
        else:
            axis = d / l
            rot = _quat_from_to_np(np.array([0.0, 1.0, 0.0]), axis)
            half = 0.5 * l
        return self._add_collider(
            body, SHAPE_CAPSULE, center, rot.astype(np.float32),
            (radius, half, 0), density, friction, restitution,
        )

    def add_cylinder_collider(self, body, radius, half_length, center=(0, 0, 0),
                              rotation=None, density=1000.0, friction=0.5,
                              restitution=0.0):
        rot = np.asarray(rotation, np.float32) if rotation is not None else _IDENTITY_QUAT
        return self._add_collider(
            body, SHAPE_CYLINDER, center, rot, (radius, half_length, 0),
            density, friction, restitution,
        )

    def add_hull_collider(self, body, points, center=(0, 0, 0), rotation=None,
                          density=1000.0, friction=0.5, restitution=0.0):
        """Convex hull collider from a point cloud (reference: hull colliders
        built from mesh geometry, src/physics/physics.cpp:58
        allocateBoundingHullGeometry).  The convex hull is computed on the
        host; vertices capped at MAX_HULL_VERTS."""
        from scipy.spatial import ConvexHull

        from .types import MAX_HULL_VERTS

        pts = np.asarray(points, np.float64)
        hull = ConvexHull(pts)
        verts = pts[hull.vertices]
        if len(verts) > MAX_HULL_VERTS:
            # Keep the extreme-most vertices by greedy farthest-point sampling.
            keep = [0]
            while len(keep) < MAX_HULL_VERTS:
                d = np.min(
                    np.linalg.norm(verts[:, None] - verts[keep][None], axis=-1),
                    axis=1,
                )
                keep.append(int(np.argmax(d)))
            verts = verts[sorted(set(keep))]
        rot = np.asarray(rotation, np.float32) if rotation is not None else _IDENTITY_QUAT
        idx = self._add_collider(
            body, SHAPE_HULL, center, rot, (0.0, 0.0, 0.0),
            density, friction, restitution,
        )
        self.colliders[idx].hull_verts = verts.astype(np.float32)
        return idx

    def add_static_plane(self, normal, offset, friction=0.8, restitution=0.0):
        n = np.asarray(normal, np.float64)
        n = n / np.linalg.norm(n)
        self.planes.append((n.astype(np.float32), float(offset), friction, restitution))
        return len(self.planes) - 1

    def add_terrain(self, heights, origin=(0.0, 0.0, 0.0), cell_size=1.0,
                    friction=0.8, restitution=0.0):
        """Static heightfield collider (reference:
        terrain/heightmap_collider.h:13, physics/heightmap_collision.cpp:509).
        All terrains in a scene must share the same grid resolution."""
        h = np.asarray(heights, np.float32)
        assert h.ndim == 2
        if self.terrains:
            assert h.shape == self.terrains[0][0].shape, \
                "all terrains must share one resolution"
        self.terrains.append(
            (h, np.asarray(origin, np.float32), float(cell_size),
             friction, restitution)
        )
        return len(self.terrains) - 1

    def add_force_field(self, center, radius, force):
        """Spherical force volume applied to bodies whose COG is inside
        (reference: physics.cpp:952 force-field interactions)."""
        self.force_fields.append(
            (np.asarray(center, np.float32), float(radius),
             np.asarray(force, np.float32))
        )
        return len(self.force_fields) - 1

    def add_trigger(self, center, radius):
        """Spherical trigger volume producing enter/leave events
        (reference: trigger components + physics.cpp:1037 callbacks)."""
        self.triggers.append((np.asarray(center, np.float32), float(radius)))
        return len(self.triggers) - 1

    # -- joints ------------------------------------------------------------

    def add_joint(self, kind: str, body_a: int, body_b: int,
                  collide_connected: bool = False, **params):
        self.joints.append(
            _Joint(
                kind=kind,
                body_a=body_a,
                body_b=body_b,
                params={k: np.asarray(v, np.float32) for k, v in params.items()},
                collide_connected=collide_connected,
            )
        )
        return len(self.joints) - 1

    def set_collide_connected(self, joint_index: int, value: bool = True):
        """Reference-parity switch for a joint added via any add_*_joint
        helper: let its two bodies collide (the reference default)."""
        self.joints[joint_index].collide_connected = value

    def _body_pose(self, body: int):
        if body < 0:
            return np.zeros(3), _IDENTITY_QUAT.copy()
        b = self.bodies[body]
        return b.pos.astype(np.float64), b.rot.astype(np.float64)

    def _to_local_point(self, body: int, p):
        pos, rot = self._body_pose(body)
        return _quat_to_mat(rot).T @ (np.asarray(p, np.float64) - pos)

    def _to_local_dir(self, body: int, d):
        _, rot = self._body_pose(body)
        return _quat_to_mat(rot).T @ np.asarray(d, np.float64)

    def add_distance_joint(self, body_a, body_b, global_anchor_a, global_anchor_b,
                           length=None):
        """Reference: src/physics/physics.cpp:147 addDistanceConstraintFromGlobalPoints."""
        if length is None:
            length = float(np.linalg.norm(
                np.asarray(global_anchor_b, np.float64)
                - np.asarray(global_anchor_a, np.float64)
            ))
        return self.add_joint(
            "distance", body_a, body_b,
            anchor_a=self._to_local_point(body_a, global_anchor_a),
            anchor_b=self._to_local_point(body_b, global_anchor_b),
            length=length,
        )

    def add_ball_joint(self, body_a, body_b, global_anchor):
        """Reference: src/physics/physics.cpp:176 addBallConstraintFromGlobalPoints."""
        return self.add_joint(
            "ball", body_a, body_b,
            anchor_a=self._to_local_point(body_a, global_anchor),
            anchor_b=self._to_local_point(body_b, global_anchor),
        )

    def _init_inv_rot(self, body_a, body_b):
        # conj(qB0) * qA0 (reference: physics.cpp:204-226, :304-330).
        _, qa = self._body_pose(body_a)
        _, qb = self._body_pose(body_b)
        return _quat_mul_np(_quat_conj_np(qb), qa)

    def add_fixed_joint(self, body_a, body_b, global_anchor):
        """Reference: src/physics/physics.cpp:204 addFixedConstraintFromGlobalPoints."""
        return self.add_joint(
            "fixed", body_a, body_b,
            anchor_a=self._to_local_point(body_a, global_anchor),
            anchor_b=self._to_local_point(body_b, global_anchor),
            init_inv_rot=self._init_inv_rot(body_a, body_b),
        )

    def add_hinge_joint(self, body_a, body_b, global_anchor, global_axis,
                        min_limit=None, max_limit=None,
                        motor_type=0.0, motor_target=0.0, max_torque=None):
        """Reference: src/physics/physics.cpp:227 addHingeConstraintFromGlobalPoints.

        min_limit in [-pi, 0] / max_limit in [0, pi]; None disables.  Motors are
        disabled unless max_torque > 0; motor_type 0 = velocity, 1 = position."""
        axis_a = self._to_local_dir(body_a, global_axis)
        axis_a /= np.linalg.norm(axis_a)
        axis_b = self._to_local_dir(body_b, global_axis)
        axis_b /= np.linalg.norm(axis_b)
        tangent_a, bitangent_a = _orthonormal_basis_np(axis_a)
        # localHingeTangentB = conj(qB) * (qA * tangentA)
        _, qa = self._body_pose(body_a)
        world_tangent = _quat_to_mat(qa) @ tangent_a
        tangent_b = self._to_local_dir(body_b, world_tangent)
        return self.add_joint(
            "hinge", body_a, body_b,
            anchor_a=self._to_local_point(body_a, global_anchor),
            anchor_b=self._to_local_point(body_b, global_anchor),
            axis_a=axis_a, axis_b=axis_b,
            tangent_a=tangent_a, bitangent_a=bitangent_a, tangent_b=tangent_b,
            min_limit=(min_limit if min_limit is not None else 1.0),
            max_limit=(max_limit if max_limit is not None else -1.0),
            motor_type=motor_type, motor_target=motor_target,
            max_torque=(max_torque if max_torque is not None else -1.0),
        )

    def add_cone_twist_joint(self, body_a, body_b, global_anchor, global_axis,
                             swing_limit=-1.0, twist_limit=-1.0,
                             swing_motor_type=0.0, swing_target=0.0,
                             swing_axis_angle=0.0, max_swing_torque=None,
                             twist_motor_type=0.0, twist_target=0.0,
                             max_twist_torque=None):
        """Reference: src/physics/physics.cpp:263 addConeTwistConstraintFromGlobalPoints.

        Negative swing/twist limits disable them."""
        axis_a = self._to_local_dir(body_a, global_axis)
        axis_a /= np.linalg.norm(axis_a)
        axis_b = self._to_local_dir(body_b, global_axis)
        axis_b /= np.linalg.norm(axis_b)
        tangent_a, bitangent_a = _orthonormal_basis_np(axis_a)
        _, qa = self._body_pose(body_a)
        world_tangent = _quat_to_mat(qa) @ tangent_a
        tangent_b = self._to_local_dir(body_b, world_tangent)
        return self.add_joint(
            "cone_twist", body_a, body_b,
            anchor_a=self._to_local_point(body_a, global_anchor),
            anchor_b=self._to_local_point(body_b, global_anchor),
            axis_a=axis_a, axis_b=axis_b,
            tangent_a=tangent_a, bitangent_a=bitangent_a, tangent_b=tangent_b,
            swing_limit=swing_limit, twist_limit=twist_limit,
            swing_motor_type=swing_motor_type, swing_target=swing_target,
            swing_axis_angle=swing_axis_angle,
            max_swing_torque=(max_swing_torque if max_swing_torque is not None else -1.0),
            twist_motor_type=twist_motor_type, twist_target=twist_target,
            max_twist_torque=(max_twist_torque if max_twist_torque is not None else -1.0),
        )

    def add_slider_joint(self, body_a, body_b, global_anchor, global_axis,
                         neg_limit=None, pos_limit=None,
                         motor_type=0.0, motor_target=0.0, max_force=None):
        """Reference: src/physics/physics.cpp:304 addSliderConstraintFromGlobalPoints.

        neg_limit <= 0 / pos_limit >= 0 to enable; None disables."""
        axis_a = self._to_local_dir(body_a, global_axis)
        axis_a /= np.linalg.norm(axis_a)
        return self.add_joint(
            "slider", body_a, body_b,
            anchor_a=self._to_local_point(body_a, global_anchor),
            anchor_b=self._to_local_point(body_b, global_anchor),
            axis_a=axis_a,
            init_inv_rot=self._init_inv_rot(body_a, body_b),
            neg_limit=(neg_limit if neg_limit is not None else 1.0),
            pos_limit=(pos_limit if pos_limit is not None else -1.0),
            motor_type=motor_type, motor_target=motor_target,
            max_force=(max_force if max_force is not None else -1.0),
        )

    # -- compilation -------------------------------------------------------

    def _mass_properties(self):
        """Aggregate collider masses into per-body mass/COG/inertia
        (reference: src/physics/rigid_body.cpp:29-93)."""
        n = len(self.bodies)
        inv_mass = np.zeros(n + 1, np.float32)
        inv_inertia = np.zeros((n + 1, 3, 3), np.float32)
        local_cog = np.zeros((n + 1, 3), np.float32)
        for bi, b in enumerate(self.bodies):
            if b.kinematic:
                continue
            total_mass = 0.0
            cog = np.zeros(3)
            items = []
            for ci in b.colliders:
                c = self.colliders[ci]
                mass, ishape, shape_cog = _shape_mass_properties(c)
                rot = _quat_to_mat(c.local_rot.astype(np.float64))
                com = c.local_pos.astype(np.float64) + rot @ shape_cog
                items.append((mass, ishape, rot, com))
                total_mass += mass
                cog += mass * com
            if total_mass <= 0.0:
                # Body without colliders: unit mass point (matches reference
                # default invMass=1, invInertia=identity).
                inv_mass[bi] = 1.0
                inv_inertia[bi] = np.eye(3)
                continue
            cog /= total_mass
            inertia = np.zeros((3, 3))
            for mass, ishape, rot, com in items:
                imat = np.diag(ishape) if np.ndim(ishape) == 1 else ishape
                i_local = rot @ imat @ rot.T
                d = com - cog
                i_local += mass * ((d @ d) * np.eye(3) - np.outer(d, d))
                inertia += i_local
            if b.mass_override is not None:
                scale = b.mass_override / total_mass
                total_mass *= scale
                inertia *= scale
            inv_mass[bi] = 1.0 / total_mass
            inv_inertia[bi] = np.linalg.inv(inertia)
            local_cog[bi] = cog
        return inv_mass, inv_inertia, local_cog

    def _collides(self, body_a: int, body_b: int) -> bool:
        if body_a == body_b:
            return False
        ba, bb = self.bodies[body_a], self.bodies[body_b]
        if ba.kinematic and bb.kinematic:
            return False
        if (
            ba.no_collide_group >= 0
            and ba.no_collide_group == bb.no_collide_group
        ):
            return False
        # Bodies connected by a joint don't collide unless the joint opted
        # into reference semantics via collide_connected (the reference
        # always collides them; no-collide groups are its only exclusion).
        for j in self.joints:
            if ({j.body_a, j.body_b} == {body_a, body_b}
                    and not j.collide_connected):
                return False
        return True

    def _compute_tethers(self, bound_radius):
        """Conservative reachability bounds through the joint graph.

        For each body, find anchor points in other bodies' frames that the
        body's colliders can never stray far from (joints are point
        constraints, so a body orbits its anchor).  Used to statically prune
        candidate contact pairs in jointed assemblies (gears of a vehicle that
        can never touch) — the build-time analogue of the reference's runtime
        broadphase (src/physics/collision_broad.cpp:297)."""
        from collections import defaultdict

        edges: Dict[int, List] = defaultdict(list)
        for j in self.joints:
            aa, ab = j.params.get("anchor_a"), j.params.get("anchor_b")
            if aa is None or ab is None:
                continue
            # Hinges constrain the body to a circle about the axis — record the
            # axis pair for a tighter (cylindrical) bound.
            ax_a = j.params.get("axis_a") if j.kind == "hinge" else None
            ax_b = j.params.get("axis_b") if j.kind == "hinge" else None
            edges[j.body_a].append((j.body_b, np.asarray(aa, np.float64),
                                    np.asarray(ab, np.float64), ax_a, ax_b))
            edges[j.body_b].append((j.body_a, np.asarray(ab, np.float64),
                                    np.asarray(aa, np.float64), ax_b, ax_a))

        # Per body: {frame: [(point_in_frame, chain_slack, anchor0_local)]}.
        # A collider of the body stays within
        #   |col_center_local - anchor0_local| + shape_radius + chain_slack
        # of `point_in_frame` (a point rigid in the frame body).
        tethers: List[Dict[int, List]] = []
        for b in range(len(self.bodies)):
            res: Dict[int, List] = {}
            frontier = [
                (nb, a_other, 0.0, a_self, ax_s, ax_o)
                for (nb, a_self, a_other, ax_s, ax_o) in edges.get(b, [])
            ]
            for depth in range(3):  # BFS depth
                next_frontier = []
                for (frame, point, slack, anchor0, ax_s, ax_o) in frontier:
                    entries = res.setdefault(frame, [])
                    if len(entries) >= 4:
                        continue
                    entries.append((point, slack, anchor0, ax_s, ax_o))
                    for (nb, a_self, a_other, _, _) in edges.get(frame, []):
                        if nb == b:
                            continue
                        next_frontier.append(
                            (nb, a_other,
                             slack + float(np.linalg.norm(point - a_self)),
                             anchor0, None, None)  # chains fall back to ball bound
                        )
                frontier = next_frontier
            tethers.append(res)
        return tethers

    _TETHER_MARGIN = 0.3  # joint drift allowance (m)

    def _tether_pruned(self, i: int, j: int, tethers, bound_radius) -> bool:
        """True if colliders i, j provably can never touch (common tether frame
        shows separation)."""
        ci, cj = self.colliders[i], self.colliders[j]
        if ci.body < 0 or cj.body < 0:
            return False

        def frames(ci_idx, cl):
            shape_r = float(bound_radius[ci_idx]) - float(np.linalg.norm(cl.local_pos))
            center = cl.local_pos.astype(np.float64)
            f: Dict[int, List[Tuple[np.ndarray, float]]] = {
                cl.body: [(center, shape_r)]
            }
            for frame, entries in tethers[cl.body].items():
                for (p, slack, anchor0, ax_s, ax_o) in entries:
                    if ax_s is not None:
                        # Hinge: collider stays on a circle about the axis —
                        # tether at the on-axis projection, radial radius.
                        ax_s64 = np.asarray(ax_s, np.float64)
                        h = float((center - anchor0) @ ax_s64)
                        radial = float(np.linalg.norm(center - anchor0 - ax_s64 * h))
                        pt = p + np.asarray(ax_o, np.float64) * h
                        f.setdefault(frame, []).append(
                            (pt, radial + shape_r + slack)
                        )
                    else:
                        r = float(np.linalg.norm(center - anchor0)) + shape_r + slack
                        f.setdefault(frame, []).append((p, r))
            return f

        fi = frames(i, ci)
        fj = frames(j, cj)
        for frame, ents_i in fi.items():
            if frame in fj:
                for (pi, ri) in ents_i:
                    for (pj, rj) in fj[frame]:
                        if float(np.linalg.norm(pi - pj)) > ri + rj + self._TETHER_MARGIN:
                            return True
        return False

    def finalize(self, dtype=np.float32, broadphase: str = "static",
                 sap_neighbors: int = 16, sap_max_contacts: int = 0,
                 sap_algorithm: str = "sweep",
                 sap_active_budget: "int | None" = None,
                 sap_row_cap: int = 16,
                 terrain_collision: str = "bilinear"):
        """Compile the scene into a SceneArchetype + initial BodyState.

        broadphase="static": enumerate all collider pairs at compile time into
        typed buckets (tether-pruned, colored) — exact, best for small scenes.
        broadphase="sap": skip pair enumeration; candidate pairs come from the
        runtime broadphase each substep (physics/broadphase.py), keeping at
        most `sap_neighbors` partners per collider.  Scales to thousands of
        bodies (the reference's SAP role,
        src/physics/collision_broad.cpp:297); requires
        PhysicsSettings(contact_mode="split_jacobi").

        sap_algorithm="sweep" (default): sort-and-prune along the
        max-variance axis with an sap_neighbors-wide sorted window —
        O(C log C + C*W), the reference algorithm in batched form.
        "dense": all-pairs AABB mask + per-row top-K (O(C^2), exact for any
        neighbor distribution).

        sap_active_budget: rows the contact table is compacted to (active
        manifolds first) before solver prep; default 4 per collider.
        """
        n = len(self.bodies)
        c = len(self.colliders)
        inv_mass, inv_inertia, local_cog = self._mass_properties()

        col_body = np.array([cl.body for cl in self.colliders], np.int32).reshape(c)
        col_type = np.array([cl.shape for cl in self.colliders], np.int32).reshape(c)
        col_local_pos = (
            np.stack([cl.local_pos for cl in self.colliders]) if c else np.zeros((0, 3))
        )
        col_local_rot = (
            np.stack([cl.local_rot for cl in self.colliders]) if c else np.zeros((0, 4))
        )
        col_size = (
            np.stack([cl.size for cl in self.colliders]) if c else np.zeros((0, 3))
        )
        col_friction = np.array([cl.friction for cl in self.colliders], np.float32)
        col_restitution = np.array([cl.restitution for cl in self.colliders], np.float32)

        bound_radius = np.zeros(c, np.float32)
        for i, cl in enumerate(self.colliders):
            if cl.shape == SHAPE_SPHERE:
                r = cl.size[0]
            elif cl.shape in (SHAPE_CAPSULE, SHAPE_CYLINDER):
                r = cl.size[0] + cl.size[1]
            elif cl.shape == SHAPE_HULL:
                r = float(np.linalg.norm(cl.hull_verts, axis=-1).max())
            else:
                r = float(np.linalg.norm(cl.size))
            bound_radius[i] = r + np.linalg.norm(cl.local_pos)

        from .types import MAX_HULL_VERTS
        hull_verts = np.zeros((c, MAX_HULL_VERTS, 3), np.float32)
        hull_mask = np.zeros((c, MAX_HULL_VERTS), bool)
        for i, cl in enumerate(self.colliders):
            if cl.hull_verts is not None:
                k = len(cl.hull_verts)
                hull_verts[i, :k] = cl.hull_verts
                hull_mask[i, :k] = True

        # --- candidate pair enumeration --------------------------------
        # Rows are sorted by collider shape so the runtime kernel dispatch is
        # one static segment per type (see types.SceneArchetype segments).
        def type_segments(rows):
            segs = []
            for (ci, _, _) in rows:
                st = self.colliders[ci].shape
                if segs and segs[-1][0] == st:
                    segs[-1] = (st, segs[-1][1], segs[-1][2] + 1)
                else:
                    start = segs[-1][2] if segs else 0
                    segs.append((st, start, start + 1))
            return tuple(segs)

        g = len(self.planes)
        vs_plane_rows = []
        for ci, cl in enumerate(self.colliders):
            if cl.body < 0 or self.bodies[cl.body].kinematic:
                continue
            for pi in range(g):
                vs_plane_rows.append((ci, pi, cl.body))
        vs_plane_rows.sort(key=lambda r: self.colliders[r[0]].shape)
        vs_plane_segments = type_segments(vs_plane_rows)

        t_count = len(self.terrains)
        vs_terrain_rows = []
        for ci, cl in enumerate(self.colliders):
            if cl.body < 0 or self.bodies[cl.body].kinematic:
                continue
            for ti in range(t_count):
                vs_terrain_rows.append((ci, ti, cl.body))
        vs_terrain_rows.sort(key=lambda r: self.colliders[r[0]].shape)
        vs_terrain_segments = type_segments(vs_terrain_rows)

        tethers = self._compute_tethers(bound_radius)

        pair_rows_by_type: Dict[Tuple[int, int], List[Tuple[int, int, int, int]]] = {}
        sap_collidable = np.zeros((0, 0), bool)
        sap_type_pairs: Tuple[Tuple[int, int], ...] = ()
        if broadphase == "sap":
            # Pair admissibility matrix for the runtime broadphase; body-level
            # results are cached since colliders >> bodies in big scenes.
            body_ok: Dict[Tuple[int, int], bool] = {}
            sap_collidable = np.zeros((c, c), bool)
            for i in range(c):
                bi = self.colliders[i].body
                for j in range(i + 1, c):
                    bj = self.colliders[j].body
                    key = (bi, bj)
                    ok = body_ok.get(key)
                    if ok is None:
                        ok = body_ok[key] = self._collides(bi, bj)
                    sap_collidable[i, j] = ok
            types = sorted({cl.shape for cl in self.colliders})
            sap_type_pairs = tuple(
                (ta, tb) for ai, ta in enumerate(types) for tb in types[ai:]
            )
            sap_body_kinematic = np.array(
                [b.kinematic for b in self.bodies], bool)
            sap_body_group = np.array(
                [b.no_collide_group for b in self.bodies], np.int32)
            sap_joint_excl = sorted({
                (min(j.body_a, j.body_b), max(j.body_a, j.body_b))
                for j in self.joints if not j.collide_connected})
            sap_joint_excl = (np.array(sap_joint_excl, np.int32)
                              if sap_joint_excl else np.zeros((0, 2), np.int32))
        else:
            sap_body_kinematic = np.zeros((0,), bool)
            sap_body_group = np.zeros((0,), np.int32)
            sap_joint_excl = np.zeros((0, 2), np.int32)
            for i in range(c):
                for j in range(i + 1, c):
                    ci, cj = self.colliders[i], self.colliders[j]
                    if not self._collides(ci.body, cj.body):
                        continue
                    if self._tether_pruned(i, j, tethers, bound_radius):
                        continue
                    a, b = i, j
                    ta, tb = ci.shape, cj.shape
                    if ta > tb:  # canonical order, e.g. sphere before box
                        a, b, ta, tb = b, a, tb, ta
                    pair_rows_by_type.setdefault((ta, tb), []).append(
                        (a, b, self.colliders[a].body, self.colliders[b].body)
                    )

        # --- global greedy coloring over all candidate rows ------------
        # Row order: plane rows, terrain rows, then buckets sorted by type
        # pair — generate_contacts concatenates in this exact order.
        all_rows: List[Tuple[int, int]] = []  # (body_a, body_b) with world = n
        for ci, pi, body in vs_plane_rows:
            all_rows.append((n, body))
        for ci, ti, body in vs_terrain_rows:
            all_rows.append((n, body))
        bucket_keys = sorted(pair_rows_by_type.keys())
        for key in bucket_keys:
            for (a, b, ba, bb) in pair_rows_by_type[key]:
                all_rows.append((ba, bb))

        colors = _greedy_color(all_rows, static_body=n)
        num_colors = (max(colors) + 1) if colors else 0
        color_indices = tuple(
            jnp.asarray(np.nonzero(np.array(colors) == col)[0].astype(np.int32))
            for col in range(num_colors)
        )

        # split colors back into tables
        q = len(vs_plane_rows)
        q2 = len(vs_terrain_rows)
        vs_plane_color = np.array(colors[:q], np.int32) if q else np.zeros(0, np.int32)

        buckets = []
        offset = q + q2
        for key in bucket_keys:
            rows = pair_rows_by_type[key]
            k = len(rows)
            buckets.append(
                ContactBucket(
                    collider_a=jnp.asarray(np.array([r[0] for r in rows], np.int32)),
                    collider_b=jnp.asarray(np.array([r[1] for r in rows], np.int32)),
                    body_a=jnp.asarray(np.array([r[2] for r in rows], np.int32)),
                    body_b=jnp.asarray(np.array([r[3] for r in rows], np.int32)),
                    color=jnp.asarray(np.array(colors[offset:offset + k], np.int32)),
                    valid=jnp.ones(k, bool),
                    type_a=key[0],
                    type_b=key[1],
                    num_colors=num_colors,
                )
            )
            offset += k

        # --- joints ----------------------------------------------------
        joint_tables, joint_color_indices = _build_joint_tables(self.joints, n)

        arch = SceneArchetype(
            inv_mass=jnp.asarray(inv_mass),
            inv_inertia=jnp.asarray(inv_inertia),
            gravity_factor=jnp.asarray(
                np.append(
                    np.array([b.gravity_factor for b in self.bodies], np.float32), 0.0
                )
            ),
            linear_damping=jnp.asarray(
                np.append(np.array([b.linear_damping for b in self.bodies], np.float32), 0.0)
            ),
            angular_damping=jnp.asarray(
                np.append(np.array([b.angular_damping for b in self.bodies], np.float32), 0.0)
            ),
            local_cog=jnp.asarray(local_cog),
            col_body=jnp.asarray(col_body),
            col_type=jnp.asarray(col_type),
            col_local_pos=jnp.asarray(col_local_pos.astype(np.float32)),
            col_local_rot=jnp.asarray(col_local_rot.astype(np.float32)),
            col_size=jnp.asarray(col_size.astype(np.float32)),
            col_friction=jnp.asarray(col_friction),
            col_restitution=jnp.asarray(col_restitution),
            col_bound_radius=jnp.asarray(bound_radius),
            col_hull_verts=jnp.asarray(hull_verts),
            col_hull_mask=jnp.asarray(hull_mask),
            plane_normal=jnp.asarray(
                np.stack([p[0] for p in self.planes]) if g else np.zeros((0, 3), np.float32)
            ),
            plane_offset=jnp.asarray(np.array([p[1] for p in self.planes], np.float32)),
            plane_friction=jnp.asarray(np.array([p[2] for p in self.planes], np.float32)),
            plane_restitution=jnp.asarray(np.array([p[3] for p in self.planes], np.float32)),
            vs_plane_collider=jnp.asarray(np.array([r[0] for r in vs_plane_rows], np.int32)),
            vs_plane_plane=jnp.asarray(np.array([r[1] for r in vs_plane_rows], np.int32)),
            vs_plane_body=jnp.asarray(np.array([r[2] for r in vs_plane_rows], np.int32)),
            vs_plane_color=jnp.asarray(vs_plane_color),
            vs_plane_valid=jnp.ones(q, bool),
            terrain_height=jnp.asarray(
                np.stack([t[0] for t in self.terrains])
                if t_count else np.zeros((0, 1, 1), np.float32)
            ),
            terrain_origin=jnp.asarray(
                np.stack([t[1] for t in self.terrains])
                if t_count else np.zeros((0, 3), np.float32)
            ),
            terrain_cell=jnp.asarray(np.array([t[2] for t in self.terrains], np.float32)),
            terrain_friction=jnp.asarray(np.array([t[3] for t in self.terrains], np.float32)),
            terrain_restitution=jnp.asarray(np.array([t[4] for t in self.terrains], np.float32)),
            vs_terrain_collider=jnp.asarray(np.array([r[0] for r in vs_terrain_rows], np.int32)),
            vs_terrain_terrain=jnp.asarray(np.array([r[1] for r in vs_terrain_rows], np.int32)),
            vs_terrain_body=jnp.asarray(np.array([r[2] for r in vs_terrain_rows], np.int32)),
            vs_terrain_valid=jnp.ones(q2, bool),
            ff_center=jnp.asarray(
                np.stack([f[0] for f in self.force_fields])
                if self.force_fields else np.zeros((0, 3), np.float32)),
            ff_radius=jnp.asarray(
                np.array([f[1] for f in self.force_fields], np.float32)),
            ff_force=jnp.asarray(
                np.stack([f[2] for f in self.force_fields])
                if self.force_fields else np.zeros((0, 3), np.float32)),
            trigger_center=jnp.asarray(
                np.stack([t[0] for t in self.triggers])
                if self.triggers else np.zeros((0, 3), np.float32)),
            trigger_radius=jnp.asarray(
                np.array([t[1] for t in self.triggers], np.float32)),
            contact_buckets=tuple(buckets),
            joints=joint_tables,
            contact_color_indices=color_indices,
            joint_color_indices=joint_color_indices,
            num_bodies=n,
            num_colliders=c,
            num_planes=g,
            num_terrains=t_count,
            vs_plane_num_colors=num_colors,
            vs_plane_segments=vs_plane_segments,
            vs_terrain_segments=vs_terrain_segments,
            terrain_tri_exact=(terrain_collision == "triangles"),
            sap_neighbors=sap_neighbors if broadphase == "sap" else 0,
            sap_max_contacts=(sap_max_contacts or 8 * max(c, 1))
            if broadphase == "sap" else 0,
            sap_mode=sap_algorithm,
            sap_row_cap=sap_row_cap,
            sap_active_budget=(
                (sap_active_budget if sap_active_budget is not None
                 else 4 * max(c, 1)) if broadphase == "sap" else 0),
            sap_type_pairs=sap_type_pairs,
            sap_collidable=jnp.asarray(sap_collidable),
            sap_body_kinematic=jnp.asarray(sap_body_kinematic),
            sap_body_group=jnp.asarray(sap_body_group),
            sap_joint_excl=jnp.asarray(sap_joint_excl),
        )

        state = BodyState(
            pos=jnp.asarray(
                np.stack([b.pos for b in self.bodies]) if n else np.zeros((0, 3))
            ).astype(dtype)
            + jnp.einsum(
                "nij,nj->ni",
                jnp.asarray(
                    np.stack([_quat_to_mat(b.rot.astype(np.float64)) for b in self.bodies])
                    if n
                    else np.zeros((0, 3, 3))
                ).astype(dtype),
                jnp.asarray(local_cog[:n]).astype(dtype),
            ),
            rot=jnp.asarray(
                np.stack([b.rot for b in self.bodies]) if n else np.zeros((0, 4))
            ).astype(dtype),
            vel=jnp.zeros((n, 3), dtype),
            omega=jnp.zeros((n, 3), dtype),
            force=jnp.zeros((n, 3), dtype),
            torque=jnp.zeros((n, 3), dtype),
        )
        return arch, state


def _quat_mul_np(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def _quat_conj_np(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def _quat_from_to_np(a, b):
    """Shortest-arc quaternion a->b (host mirror of maths.quat_from_to)."""
    w = 1.0 + float(a @ b)
    if w < 1e-6:
        t1, _ = _orthonormal_basis_np(a)
        q = np.array([t1[0], t1[1], t1[2], 0.0])
    else:
        v = np.cross(a, b)
        q = np.array([v[0], v[1], v[2], w])
    return q / np.linalg.norm(q)


def _orthonormal_basis_np(n):
    """Host-side mirror of maths.orthonormal_basis (same Duff et al. formula)."""
    sign = 1.0 if n[2] >= 0.0 else -1.0
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    t1 = np.array([1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0]])
    t2 = np.array([b, sign + n[1] * n[1] * a, -n[1]])
    return t1, t2


def _greedy_color(rows: Sequence[Tuple[int, int]], static_body: int) -> List[int]:
    """Greedy conflict-free coloring: rows sharing a dynamic body get distinct
    colors.  Kinematic/static bodies (invMass 0) never receive impulses, so only
    dynamic sharing conflicts — the same rule the reference uses when packing
    SIMD constraint batches (src/physics/constraints.cpp: scheduleConstraintsSIMD)."""
    used_per_color: List[set] = []
    colors: List[int] = []
    for (a, b) in rows:
        keys = [x for x in (a, b) if x != static_body]
        col = 0
        while True:
            if col == len(used_per_color):
                used_per_color.append(set())
            if all(k not in used_per_color[col] for k in keys):
                used_per_color[col].update(keys)
                colors.append(col)
                break
            col += 1
    return colors


def _build_joint_tables(joints: List[_Joint], num_bodies: int):
    """Group joints by kind, color each kind independently."""
    by_kind: Dict[str, List[_Joint]] = {}
    for j in joints:
        by_kind.setdefault(j.kind, []).append(j)

    tables = []
    color_indices_all = []
    for kind in sorted(by_kind.keys()):
        js = by_kind[kind]
        rows = [(j.body_a if j.body_a >= 0 else num_bodies,
                 j.body_b if j.body_b >= 0 else num_bodies) for j in js]
        colors = _greedy_color(rows, static_body=num_bodies)
        num_colors = (max(colors) + 1) if colors else 0
        color_indices = tuple(
            jnp.asarray(np.nonzero(np.array(colors) == col)[0].astype(np.int32))
            for col in range(num_colors)
        )
        params: Dict[str, jnp.ndarray] = {}
        if js:
            for key in js[0].params:
                params[key] = jnp.asarray(np.stack([j.params[key] for j in js]))
        tables.append(
            JointTable(
                body_a=jnp.asarray(np.array([r[0] for r in rows], np.int32)),
                body_b=jnp.asarray(np.array([r[1] for r in rows], np.int32)),
                color=jnp.asarray(np.array(colors, np.int32)),
                valid=jnp.ones(len(js), bool),
                params=params,
                kind=kind,
                num_colors=num_colors,
            )
        )
        color_indices_all.append(color_indices)
    return tuple(tables), tuple(color_indices_all)
