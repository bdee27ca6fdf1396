"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from d3d12renderer_tpu.learning.loco_env import LocoEnv
from d3d12renderer_tpu.learning.ppo import PPOConfig, make_ppo
from d3d12renderer_tpu.parallel.data_parallel import (
    make_distributed_ppo, make_mesh,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_distributed_ppo_one_iteration():
    mesh = make_mesh(8)
    env = LocoEnv()
    config = PPOConfig(num_envs=2, rollout_steps=4, minibatches=2, epochs=1)
    init, train, _ = make_distributed_ppo(env, config, mesh)
    state = init(jax.random.PRNGKey(0))
    state, metrics = train(state)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


@pytest.mark.slow
def test_distributed_params_stay_replicated():
    """After a training step with psum'd gradients, every shard must hold
    identical parameters."""
    mesh = make_mesh(4)
    env = LocoEnv()
    config = PPOConfig(num_envs=2, rollout_steps=4, minibatches=1, epochs=1,
                       learning_rate=1e-3)
    init, train, _ = make_distributed_ppo(env, config, mesh)
    state = init(jax.random.PRNGKey(1))
    state, _ = train(state)
    # Pull each leaf fully addressable and compare device shards.
    for leaf in jax.tree_util.tree_leaves(state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
