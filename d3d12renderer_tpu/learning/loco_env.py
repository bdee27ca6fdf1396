"""Vectorized DReCon-style ragdoll locomotion environment, fully on-device.

Replaces the reference's C++ physics DLL + ctypes gym wrapper + SubprocVecEnv
process pool (reference: src/learning/learned_locomotion.cpp:395-489,
learning/loco_env.py:7-62, learning/util.py:30-47) with a pure-JAX env whose
batch axis is `jax.vmap` — thousands of ragdolls per chip, shardable across an
ICI mesh with data parallelism.

State (66): cog velocity, 6 body-part positions+velocities in the torso ground
frame, last smoothed action (reference: learned_locomotion.h:41-64).
Action (27): per cone-twist {twist target, swing target, swing axis angle} x 7,
per hinge {target angle} x 6 (reference: learned_locomotion.h:17-33).
Reward: DReCon imitation of the standing pose + fall factor
(reference: learned_locomotion.cpp:343-365 getReward).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import maths as m
from ..models import ragdoll as rd
from ..physics.builder import SceneBuilder
from ..physics.step import physics_step
from ..physics.types import BodyState, PhysicsSettings

NUM_PARTS = 14
ACTION_SIZE = rd.NUM_CONE_TWIST * 3 + rd.NUM_HINGE  # 27
STATE_SIZE = 3 + 6 * 6 + ACTION_SIZE                # 66

ACTION_SMOOTHING = 0.1   # reference: learned_locomotion.cpp:95
POKE_PROBABILITY = 0.02  # reference: learned_locomotion.cpp:459
POKE_STRENGTH = 1000.0   # reference: physics.h:404 testPhysicsInteraction default
FRAME_RATE = 60          # reference: learned_locomotion.cpp:470

# State observation parts, struct order (reference: learned_locomotion.h:41-64).
OBS_PARTS = ["left_toes", "right_toes", "torso", "head",
             "left_lower_arm", "right_lower_arm"]


@struct.dataclass
class EnvState:
    bodies: BodyState
    last_action: jnp.ndarray   # (27,) smoothed
    rng: jnp.ndarray           # PRNG key
    steps: jnp.ndarray         # () int32


class LocoEnv:
    """Single-environment definition; `reset`/`step` are pure and vmap-able."""

    def __init__(self, settings: Optional[PhysicsSettings] = None,
                 self_collision: bool = False):
        b = SceneBuilder()
        b.add_static_plane((0.0, 1.0, 0.0), 0.0, friction=1.0, restitution=0.1)
        info = rd.build_humanoid_ragdoll(
            b, hip_position=(0.0, 1.25, 0.0), self_collision=self_collision
        )
        self.arch, self._state0 = b.finalize()
        self.info = info
        self.settings = settings or PhysicsSettings(frame_rate=FRAME_RATE)

        # Joint-table bookkeeping: builder groups joints by kind (sorted);
        # rows within each table keep insertion order == ragdoll.h order.
        self._table_index = {t.kind: k for k, t in enumerate(self.arch.joints)}
        self._num_tables = len(self.arch.joints)

        self.part_idx = jnp.asarray(np.array(info.body_indices, np.int32))
        self.parent_idx = jnp.asarray(np.array(rd.BODY_PART_PARENTS, np.int32))
        self.local_points = jnp.asarray(info.local_points)  # (14,6,3)
        self.obs_part_slots = jnp.asarray(np.array(
            [rd.BODY_PARTS.index(n) for n in OBS_PARTS], np.int32))

        # Imitation targets from the initial standing pose
        # (reference: training_locomotion::reset, getBodyPartTarget).
        p0 = self._state0
        pts0 = self._world_points(p0)                 # (14,6,3)
        self.target_points = pts0
        self.target_velocities = jnp.zeros_like(pts0)
        q0 = p0.rot[self.part_idx]                    # (14,4)
        qp0 = jnp.where(
            (self.parent_idx >= 0)[:, None],
            p0.rot[self.part_idx[jnp.maximum(self.parent_idx, 0)]],
            jnp.zeros((NUM_PARTS, 4)).at[:, 3].set(1.0),
        )
        self.target_local_rot = m.quat_mul(q0, m.quat_conj(qp0))  # (14,4)
        head = rd.BODY_PARTS.index("head")
        self.head_target_height = float(p0.pos[self.part_idx[head], 1])
        self.torso_velocity_target = jnp.zeros(3)
        # Reset observation, computed EAGERLY here: the fused-kernel builder
        # embeds it as constants and must not pick up tracers when the env
        # step is traced (jnp constant creation is staged under jit).
        self._obs0 = np.asarray(jax.device_get(
            self._get_obs(self._state0, jnp.zeros(ACTION_SIZE))))
        # The fused whole-env-step runner is built once per instance:
        # make_kernel_runner extracts archetype constants with host-side
        # device_get syncs, which must not be paid on every step()/retrace.
        self._fused_step_cache = None
        self._fused_step_built = False

    # -- helpers -----------------------------------------------------------

    def _world_points(self, bodies: BodyState):
        """World positions of the 6 sample points of each part.

        transformPosition(bodyTransform, p) with COG state:
        world = cog + R (p_local - local_cog)."""
        idx = self.part_idx
        cog = bodies.pos[idx]            # (14,3)
        rot = bodies.rot[idx]            # (14,4)
        lc = self.arch.local_cog[idx]    # (14,3)
        rel = self.local_points - lc[:, None, :]
        return cog[:, None, :] + m.quat_rotate(rot[:, None, :], rel)

    def _coordinate_origin(self, bodies: BodyState):
        """Torso COG projected to the ground, identity rotation
        (reference: learned_locomotion.cpp:113 getCoordinateSystem)."""
        torso = bodies.pos[self.part_idx[0]]
        return torso * jnp.array([1.0, 0.0, 1.0])

    def _get_obs(self, bodies: BodyState, last_action):
        origin = self._coordinate_origin(bodies)
        torso_vel = bodies.vel[self.part_idx[0]]
        slots = self.obs_part_slots
        pos = bodies.pos[self.part_idx[slots]] - origin   # (6,3)
        vel = bodies.vel[self.part_idx[slots]]            # (6,3)
        pv = jnp.concatenate([pos, vel], axis=-1).reshape(-1)  # (36,)
        return jnp.concatenate([torso_vel, pv, last_action])

    def _has_fallen(self, bodies: BodyState):
        head_y = bodies.pos[self.part_idx[rd.BODY_PARTS.index("head")], 1]
        return head_y < 1.0

    def _reward(self, bodies: BodyState):
        """reference: training_locomotion::getReward (learned_locomotion.cpp:343)."""
        idx = self.part_idx
        pts = self._world_points(bodies)                       # (14,6,3)
        pos_err = jnp.sum(jnp.linalg.norm(pts - self.target_points, axis=-1))

        cog = bodies.pos[idx]
        vel = bodies.vel[idx]
        omega = bodies.omega[idx]
        pt_vel = vel[:, None, :] + jnp.cross(
            omega[:, None, :], pts - cog[:, None, :]
        )
        vel_err = jnp.sum(jnp.linalg.norm(pt_vel - self.target_velocities, axis=-1))

        q = bodies.rot[idx]
        qp = jnp.where(
            (self.parent_idx >= 0)[:, None],
            bodies.rot[idx[jnp.maximum(self.parent_idx, 0)]],
            jnp.zeros((NUM_PARTS, 4)).at[:, 3].set(1.0),
        )
        local = m.quat_mul(q, m.quat_conj(qp))
        diff = m.quat_mul(self.target_local_rot, m.quat_conj(local))
        rot_err = jnp.sum(2.0 * jnp.arccos(jnp.clip(diff[..., 3], -1.0, 1.0)))

        vcm_err = m.length(bodies.vel[idx[0]] - self.torso_velocity_target)

        n = float(NUM_PARTS)
        rp = jnp.exp(-10.0 / n * pos_err)
        rv = jnp.exp(-1.0 / n * vel_err)
        rlocal = jnp.exp(-10.0 / n * rot_err)
        rvcm = jnp.exp(-vcm_err)

        head_y = bodies.pos[idx[rd.BODY_PARTS.index("head")], 1]
        fall = jnp.clip(1.3 - 1.4 * (self.head_target_height - head_y), 0.0, 1.0)
        return fall * (rp + rv + rlocal + rvcm)

    def _motor_overrides(self, smoothed_action):
        """Works for per-scene (27,) and batched (..., 27) actions."""
        lead = smoothed_action.shape[:-1]
        ct = smoothed_action[..., : rd.NUM_CONE_TWIST * 3].reshape(
            lead + (rd.NUM_CONE_TWIST, 3))
        hinge = smoothed_action[..., rd.NUM_CONE_TWIST * 3:]
        overrides = [None] * self._num_tables
        overrides[self._table_index["cone_twist"]] = {
            "twist_target": ct[..., 0],
            "swing_target": ct[..., 1],
            "swing_axis_angle": ct[..., 2],
        }
        overrides[self._table_index["hinge"]] = {"motor_target": hinge}
        return tuple(overrides)

    def _maybe_poke(self, bodies: BodyState, key):
        """Random horizontal impulse poke on one body part
        (reference: learned_locomotion.cpp:459-467 + physics.cpp:555)."""
        k1, k2, k3 = jax.random.split(key, 3)
        do = jax.random.uniform(k1) < POKE_PROBABILITY
        part = jax.random.randint(k2, (), 0, NUM_PARTS)
        theta = jax.random.uniform(k3, minval=0.0, maxval=2.0 * jnp.pi)
        direction = jnp.array([jnp.cos(theta), 0.0, jnp.sin(theta)])
        body = self.part_idx[part]
        point = bodies.pos[body] + jnp.array([0.0, 0.2, 0.0])
        force = direction * POKE_STRENGTH * do
        torque = jnp.cross(point - bodies.pos[body], force)
        return bodies.replace(
            force=bodies.force.at[body].add(force),
            torque=bodies.torque.at[body].add(torque),
        )

    # -- fused whole-env-step kernel ----------------------------------------

    def _build_post_stage(self):
        """Tile-algebra obs/reward/fall/auto-reset stage appended to the
        fused substep kernel (whole env step on-chip; mirrors _step_core's
        post-physics body exactly, with _acos standing in for arccos)."""
        from ..physics import substep_pallas as sp

        idx = [int(i) for i in np.asarray(self.part_idx)]
        parent = [int(i) for i in np.asarray(self.parent_idx)]
        lcog = np.asarray(jax.device_get(self.arch.local_cog))
        local_pts = np.asarray(self.local_points)           # (14,6,3)
        tgt_pts = np.asarray(self.target_points)            # (14,6,3)
        tgt_lrot = np.asarray(self.target_local_rot)        # (14,4)
        obs_slots = [int(s) for s in np.asarray(self.obs_part_slots)]
        head_b = idx[rd.BODY_PARTS.index("head")]
        head_h = float(self.head_target_height)
        obs0 = self._obs0
        s0 = {k: np.asarray(jax.device_get(getattr(self._state0, k)))
              for k in ("pos", "rot", "vel", "omega")}

        # Table positions in the kernel's solve-order-sorted layout.
        from ..physics import joints as joints_mod
        order = {k: i for i, k in enumerate(joints_mod.JOINT_SOLVE_ORDER)}
        table_order = sorted(range(len(self.arch.joints)),
                             key=lambda k: order[self.arch.joints[k].kind])
        tpos_of = {self.arch.joints[k].kind: i
                   for i, k in enumerate(table_order)}
        ct_t, h_t = tpos_of["cone_twist"], tpos_of["hinge"]
        n_parts = len(idx)

        def post_stage(ctx):
            pos, rot = ctx["pos"], ctx["rot"]
            vel, omega = ctx["vel"], ctx["omega"]
            ovr = ctx["ovr"]

            # World sample points of each part (reference:
            # learned_locomotion.cpp getBodyPartTarget 6-point sampling).
            pts = []
            for p in range(n_parts):
                b = idx[p]
                row = []
                for k in range(6):
                    rel = tuple(float(x)
                                for x in (local_pts[p, k] - lcog[b]))
                    row.append(sp._vadd(pos[b], sp._qrotate(rot[b], rel)))
                pts.append(row)

            pos_err = 0.0
            vel_err = 0.0
            for p in range(n_parts):
                b = idx[p]
                for k in range(6):
                    d = sp._vsub(pts[p][k],
                                 tuple(float(x) for x in tgt_pts[p, k]))
                    pos_err = sp._add(pos_err, jnp.sqrt(sp._vdot(d, d)))
                    r = sp._vsub(pts[p][k], pos[b])
                    pv = sp._vadd(vel[b], sp._vcross(omega[b], r))
                    vel_err = sp._add(vel_err, jnp.sqrt(sp._vdot(pv, pv)))

            rot_err = 0.0
            ident = (0.0, 0.0, 0.0, 1.0)
            for p in range(n_parts):
                q = rot[idx[p]]
                qp = rot[idx[parent[p]]] if parent[p] >= 0 else ident
                local = sp._qmul(q, sp._qconj(qp))
                diff = sp._qmul(tuple(float(x) for x in tgt_lrot[p]),
                                sp._qconj(local))
                rot_err = sp._add(
                    rot_err,
                    2.0 * sp._acos(jnp.clip(diff[3], -1.0, 1.0)))

            vcm = vel[idx[0]]
            vcm_err = jnp.sqrt(sp._vdot(vcm, vcm))
            n = float(n_parts)
            rsum = (jnp.exp(-10.0 / n * pos_err) + jnp.exp(-1.0 / n * vel_err)
                    + jnp.exp(-10.0 / n * rot_err) + jnp.exp(-vcm_err))
            head_y = pos[head_b][1]
            fall = jnp.clip(1.3 - 1.4 * (head_h - head_y), 0.0, 1.0)
            done = head_y < 1.0
            reward = jnp.where(done, 0.0, fall * rsum)

            # Observation (reference: learned_locomotion.h:41-64 layout).
            torso = idx[0]
            ox, oz = pos[torso][0], pos[torso][2]
            obs = list(vel[torso])
            for s in obs_slots:
                b = idx[s]
                obs += [pos[b][0] - ox, pos[b][1], pos[b][2] - oz,
                        vel[b][0], vel[b][1], vel[b][2]]
            for i in range(rd.NUM_CONE_TWIST):
                obs += [ovr[(ct_t, "twist_target")][i],
                        ovr[(ct_t, "swing_target")][i],
                        ovr[(ct_t, "swing_axis_angle")][i]]
            for j in range(rd.NUM_HINGE):
                obs.append(ovr[(h_t, "motor_target")][j])
            obs = [jnp.where(done, float(obs0[c]), v)
                   for c, v in enumerate(obs)]

            # Body auto-reset to the standing pose.
            def reset_vec(cur, const_row):
                return tuple(jnp.where(done, float(c), x)
                             for c, x in zip(const_row, cur))

            for b in range(len(pos)):
                pos[b] = reset_vec(pos[b], s0["pos"][b])
                rot[b] = reset_vec(rot[b], s0["rot"][b])
                vel[b] = reset_vec(vel[b], s0["vel"][b])
                omega[b] = reset_vec(omega[b], s0["omega"][b])

            extras = obs + [reward, jnp.where(done, 1.0, 0.0)]
            return pos, rot, vel, omega, extras

        return post_stage

    def _fused_env_step(self):
        """custom_vmap'd whole-env-step kernel, or None off-TPU/unsupported.
        Unbatched calls fall back to _step_core (identical semantics)."""
        from jax.custom_batching import custom_vmap

        from ..physics import substep_pallas as sp

        mode = sp._should_build(self.settings)
        if mode is None:
            return None
        # The fused kernel integrates ONE substep of h = 1/FRAME_RATE.  The
        # fallback _step_core substeps at settings.frame_rate (physics_step:
        # num_substeps = round(dt * frame_rate), h = 1/frame_rate), so the
        # two paths only compute identical dynamics when the physics rate
        # equals the 60 Hz control rate.  Refuse to build otherwise rather
        # than silently integrating different dynamics per backend.
        if float(self.settings.frame_rate) != float(FRAME_RATE):
            return None
        template = self._motor_overrides(jnp.zeros(ACTION_SIZE))
        run = sp.make_kernel_runner(
            self.arch, self.settings, 1.0 / FRAME_RATE, template,
            post_stage=self._build_post_stage(), n_extra=STATE_SIZE + 2)
        if run is None:
            return None
        env = self

        @custom_vmap
        def fused(bodies, smoothed):
            return env._step_core(bodies, smoothed)

        @fused.def_vmap
        def fused_vmap(axis_size, in_batched, bodies, smoothed):
            def bcast(tree, batched):
                return jax.tree_util.tree_map(
                    lambda leaf, b: leaf if b else jnp.broadcast_to(
                        leaf, (axis_size,) + leaf.shape),
                    tree, batched)

            bodies_b = bcast(bodies, in_batched[0])
            smoothed_b = bcast(smoothed, in_batched[1])
            on_tpu = jax.default_backend() == "tpu"
            if not on_tpu and mode != "force":
                out = jax.vmap(env._step_core)(bodies_b, smoothed_b)
            else:
                leaves = sp.ovr_leaves(env._motor_overrides(smoothed_b))
                st, extra = run(bodies_b, leaves, interpret=not on_tpu)
                out = (st, extra[:, :STATE_SIZE], extra[:, STATE_SIZE],
                       extra[:, STATE_SIZE + 1] > 0.5)
            return out, jax.tree_util.tree_map(lambda _: True, out)

        return fused

    # -- public API --------------------------------------------------------

    def reset(self, key) -> Tuple[jnp.ndarray, EnvState]:
        zero_action = jnp.zeros(ACTION_SIZE)
        env_state = EnvState(
            bodies=self._state0,
            last_action=zero_action,
            rng=key,
            steps=jnp.zeros((), jnp.int32),
        )
        return self._get_obs(self._state0, zero_action), env_state

    def _step_core(self, bodies: BodyState, smoothed):
        """Physics + done/reward/obs + body auto-reset for one scene.
        Shared by the regular path and the fused kernel's fallback."""
        bodies, _ = physics_step(
            self.arch, bodies, self.settings, 1.0 / FRAME_RATE,
            motor_overrides=self._motor_overrides(smoothed),
        )
        done = self._has_fallen(bodies)
        reward = jnp.where(done, 0.0, self._reward(bodies))
        obs = self._get_obs(bodies, smoothed)

        # Auto-reset (vectorized-env convention, like the reference's VecEnv).
        bodies = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), self._state0, bodies
        )
        obs = jnp.where(
            done, self._get_obs(self._state0, jnp.zeros(ACTION_SIZE)), obs)
        return bodies, obs, reward, done

    def step(self, env_state: EnvState, action) -> Tuple[
        jnp.ndarray, EnvState, jnp.ndarray, jnp.ndarray
    ]:
        """One 60 Hz control step.  Auto-resets when fallen.

        On TPU (or fused_substep="force") the WHOLE step body — physics
        substep, observation, reward, fall check, body auto-reset — runs as
        one fused Pallas kernel per 1024-env tile (physics/substep_pallas.py
        + _fused_post_stage below); only the action smoothing, poke RNG and
        step counter stay outside."""
        rng, poke_key = jax.random.split(env_state.rng)
        smoothed = env_state.last_action + ACTION_SMOOTHING * (
            action - env_state.last_action
        )
        bodies = self._maybe_poke(env_state.bodies, poke_key)
        if not self._fused_step_built:
            self._fused_step_cache = self._fused_env_step()
            self._fused_step_built = True
        fused = self._fused_step_cache
        if fused is not None:
            bodies, obs, reward, done = fused(bodies, smoothed)
        else:
            bodies, obs, reward, done = self._step_core(bodies, smoothed)
        smoothed = jnp.where(done, jnp.zeros_like(smoothed), smoothed)
        env_state = EnvState(
            bodies=bodies, last_action=smoothed, rng=rng,
            steps=jnp.where(done, 0, env_state.steps + 1),
        )
        return obs, env_state, reward, done

    def action_limits(self):
        """Per-dimension action bounds from joint limits
        (reference: learned_locomotion.cpp:365-427 getPhysicsRanges/getLimits)."""
        lo, hi = [], []
        ct_table = self.arch.joints[self._table_index["cone_twist"]]
        h_table = self.arch.joints[self._table_index["hinge"]]
        tl = np.asarray(ct_table.params["twist_limit"])
        sl = np.asarray(ct_table.params["swing_limit"])
        for i in range(rd.NUM_CONE_TWIST):
            t = tl[i] if tl[i] >= 0 else np.pi
            s = sl[i] if sl[i] >= 0 else np.pi
            lo += [-t, -s, -np.pi]
            hi += [t, s, np.pi]
        mn = np.asarray(h_table.params["min_limit"])
        mx = np.asarray(h_table.params["max_limit"])
        for i in range(rd.NUM_HINGE):
            lo.append(mn[i] if mn[i] <= 0 else -np.pi)
            hi.append(mx[i] if mx[i] >= 0 else np.pi)
        return np.array(lo, np.float32), np.array(hi, np.float32)


def make_vec_env(env: LocoEnv, batch_size: int):
    """Jitted batched reset/step over a leading env axis (vmap)."""

    @jax.jit
    def reset(key):
        keys = jax.random.split(key, batch_size)
        return jax.vmap(env.reset)(keys)

    @jax.jit
    def step(env_state, actions):
        return jax.vmap(env.step)(env_state, actions)

    return reset, step
