"""Pallas whole-loop colored solver vs the XLA colored path.

Follows the reference's device-kernel-vs-host-reference self-test pattern
(reference: src/rendering/bitonic_sort.cpp:215-281): identical scenes stepped
through both solver backends must produce matching trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3d12renderer_tpu.learning.loco_env import ACTION_SIZE, LocoEnv
from d3d12renderer_tpu.physics.types import PhysicsSettings


@pytest.mark.slow
def test_pallas_solver_matches_xla_on_loco_env():
    B, steps = 4, 3
    envs = {
        backend: LocoEnv(settings=PhysicsSettings(
            frame_rate=60, solver_iterations=10, solver_backend=backend))
        for backend in ("pallas", "xla")
    }
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    actions = jax.random.uniform(
        jax.random.PRNGKey(1), (steps, B, ACTION_SIZE), minval=-0.4, maxval=0.4
    )

    results = {}
    for backend, env in envs.items():
        obs, st = jax.jit(jax.vmap(env.reset))(keys)
        step = jax.jit(jax.vmap(env.step))
        for t in range(steps):
            obs, st, reward, done = step(st, actions[t])
        results[backend] = (st.bodies.pos, st.bodies.rot,
                            st.bodies.vel, st.bodies.omega, reward)

    for a, b in zip(results["pallas"], results["xla"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pallas_solver_unbatched_falls_back():
    """Non-vmapped calls route through the per-scene XLA fallback."""
    env = LocoEnv(settings=PhysicsSettings(
        frame_rate=60, solver_iterations=5, solver_backend="pallas"))
    obs, st = env.reset(jax.random.PRNGKey(0))
    obs, st, reward, done = jax.jit(env.step)(st, jnp.zeros(ACTION_SIZE))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(float(reward))
