"""Whole-substep fused Pallas kernel (physics/substep_pallas.py).

Parity strategy mirrors the reference's device-kernel-vs-host-reference
pattern (SURVEY.md §4, bitonic self-test): the fused kernel in interpret mode
must reproduce the regular XLA substep path on the locomotion archetype to
atan2/acos-polynomial accuracy (~1e-7 per step).  Also pins the dispatch
contract: CPU + "auto" never engages the kernel (contacts stay available),
and unsupported archetypes report a reason instead of miscompiling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3d12renderer_tpu.learning.loco_env import ACTION_SIZE, LocoEnv
from d3d12renderer_tpu.physics import substep_pallas
from d3d12renderer_tpu.physics.builder import SceneBuilder
from d3d12renderer_tpu.physics.step import physics_step
from d3d12renderer_tpu.physics.types import PhysicsSettings


def _rollout(fused, steps=2, batch=2, iters=4):
    env = LocoEnv(settings=PhysicsSettings(
        frame_rate=60, solver_iterations=iters, fused_substep=fused))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    obs, st = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.default_rng(1)
    reward = None
    for _ in range(steps):
        act = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ACTION_SIZE)),
                          jnp.float32)
        obs, st, reward, done = step(st, act)
    return st.bodies, reward, obs


@pytest.mark.slow
def test_fused_substep_matches_regular_path():
    """With fused_substep="force" the WHOLE env step (physics + obs/reward/
    fall/auto-reset) runs as the interpret-mode kernel — parity covers the
    env-fused post stage, not just the physics substep."""
    ref, r_ref, o_ref = _rollout("off")
    got, r_got, o_got = _rollout("force")  # interpret-mode kernel on CPU
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.rot), np.asarray(ref.rot),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.omega), np.asarray(ref.omega),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_got), np.asarray(o_ref),
                               atol=5e-5)


def test_auto_mode_stays_off_cpu():
    """On CPU, "auto" must not route through the fused wrapper: contacts from
    physics_step stay available for events/tests."""
    env = LocoEnv(settings=PhysicsSettings(frame_rate=60))
    fused = substep_pallas.make_fused_substep(
        env.arch, env.settings, 1.0 / 60.0, None)
    assert fused is None  # default backend is cpu under conftest
    state, contacts = physics_step(
        env.arch, env._state0, env.settings, 1.0 / 60.0)
    assert contacts is not None


def test_support_reason_gates():
    env = LocoEnv(settings=PhysicsSettings(frame_rate=60))
    ok = substep_pallas.support_reason(env.arch, env.settings)
    assert ok is None, ok
    assert "contact_mode" in substep_pallas.support_reason(
        env.arch, PhysicsSettings(contact_mode="split_jacobi"))
    assert "xla" in substep_pallas.support_reason(
        env.arch, PhysicsSettings(solver_backend="xla"))

    b = SceneBuilder()
    b.add_static_plane((0.0, 1.0, 0.0), 0.0)
    a = b.add_body((0.0, 1.0, 0.0))
    c = b.add_body((0.0, 2.0, 0.0))
    b.add_sphere_collider(a, radius=0.5)
    b.add_sphere_collider(c, radius=0.5)
    b.add_slider_joint(a, c, global_anchor=(0.0, 1.5, 0.0),
                       global_axis=(0.0, 1.0, 0.0))
    arch, _ = b.finalize()
    assert "slider" in substep_pallas.support_reason(arch, PhysicsSettings())


def test_fused_unbatched_falls_back():
    """Per-scene (unbatched) calls take the custom_vmap fallback: identical
    to the regular path bit-for-bit."""
    env = LocoEnv(settings=PhysicsSettings(
        frame_rate=60, solver_iterations=4, fused_substep="force"))
    fused = substep_pallas.make_fused_substep(
        env.arch, env.settings, 1.0 / 60.0, None)
    assert fused is not None
    new_state = jax.jit(lambda s: fused(s, None))(env._state0)
    ref, _ = physics_step(
        env.arch,
        env._state0,
        PhysicsSettings(frame_rate=60, solver_iterations=4,
                        fused_substep="off"),
        1.0 / 60.0, num_substeps=1)
    np.testing.assert_allclose(np.asarray(new_state.pos), np.asarray(ref.pos),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_state.vel), np.asarray(ref.vel),
                               atol=1e-7)
