"""Policy/value networks (flax).

Architectures mirror the SB3 defaults the reference trains with so rewards are
comparable run-for-run:

- PPO "MlpPolicy": separate 64-64 tanh MLPs for policy mean and value, with a
  state-independent log-std (reference solvers/RL/ppo_train.py:92 uses SB3
  defaults).
- DDPG "MlpPolicy": 400-300 ReLU actor (tanh-squashed to the action space) and
  Q-network (reference solvers/RL/ddpg_train.py:109-113 uses SB3 defaults).

Everything is sized for the MXU: batched matmuls in bf16/f32 with
``preferred_element_type`` left to XLA's default f32 accumulation.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "tanh"
    out_dim: int = 1
    out_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        act = nn.tanh if self.activation == "tanh" else nn.relu
        for f in self.features:
            x = act(nn.Dense(f, kernel_init=nn.initializers.orthogonal(np.sqrt(2)))(x))
        return nn.Dense(
            self.out_dim, kernel_init=nn.initializers.orthogonal(self.out_scale)
        )(x)


class ActorCritic(nn.Module):
    """PPO actor-critic with SB3-default torso sizes."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        mean = MLP(self.hidden, "tanh", self.action_dim, 0.01, name="pi")(obs)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        value = MLP(self.hidden, "tanh", 1, 1.0, name="vf")(obs)
        return mean, log_std, jnp.squeeze(value, axis=-1)


class DDPGActor(nn.Module):
    """DDPG actor: tanh output scaled/shifted into the env's action box."""

    action_dim: int
    action_low: tuple
    action_high: tuple
    hidden: Sequence[int] = (400, 300)

    @nn.compact
    def __call__(self, obs):
        x = MLP(self.hidden, "relu", self.action_dim, 1.0, name="mu")(obs)
        squashed = jnp.tanh(x)
        low = jnp.asarray(self.action_low, squashed.dtype)
        high = jnp.asarray(self.action_high, squashed.dtype)
        return low + (squashed + 1.0) * 0.5 * (high - low)


class DDPGCritic(nn.Module):
    hidden: Sequence[int] = (400, 300)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        return jnp.squeeze(MLP(self.hidden, "relu", 1, 1.0, name="q")(x), axis=-1)
