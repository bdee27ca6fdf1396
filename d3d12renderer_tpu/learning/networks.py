"""Actor-critic policy networks.

Architecture matches the reference's stable-baselines3 MlpPolicy config:
separate policy and value towers, each 2x128 with tanh activations, a linear
action head initialized U(-0.01, 0.01), and a state-independent log-std
(reference: learning/learn_locomotion.py:70-71,99-104; inference-side MLP at
src/learning/learned_locomotion.cpp:11-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

HIDDEN = 128


class ActorCritic(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        pi = obs
        for i in range(2):
            pi = nn.tanh(nn.Dense(HIDDEN, name=f"pi_{i}")(pi))
        mean = nn.Dense(
            self.action_dim, name="action_head",
            kernel_init=nn.initializers.uniform(scale=0.01),
            bias_init=nn.initializers.zeros,
        )(pi)

        vf = obs
        for i in range(2):
            vf = nn.tanh(nn.Dense(HIDDEN, name=f"vf_{i}")(vf))
        value = nn.Dense(1, name="value_head")(vf)

        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,)
        )
        return mean, log_std, jnp.squeeze(value, -1)


def sample_action(mean, log_std, key):
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape)
    action = mean + std * noise
    logp = gaussian_logp(action, mean, log_std)
    return action, logp


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
