"""Dueling Q-network heads (reference parity: pfrl/q_functions/dueling_dqn.py:20-129).

Value and advantage streams with mean-subtracted advantages. ``dense_cls``
lets Rainbow swap in FactorizedNoisyDense (the declarative form of the
reference's ``to_factorized_noisy`` tree rewrite).
"""

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu import initializers
from pfrl_tpu.action_value import (
    DiscreteActionValue,
    DistributionalDiscreteActionValue,
)
from pfrl_tpu.models.atari_cnn import LargeAtariCNN


def _default_dense(features, **kwargs):
    kwargs.setdefault("kernel_init", initializers.chainer_default_w())
    kwargs.setdefault("bias_init", initializers.zeros)
    return nn.Dense(features, **kwargs)


class DuelingDQN(nn.Module):
    """Conv torso + dueling value/advantage streams (dueling_dqn.py:20-64)."""

    n_actions: int
    activation: Callable = nn.relu
    dense_cls: Any = None  # factory(features) -> module; noisy-able

    @nn.compact
    def __call__(self, x: jax.Array) -> DiscreteActionValue:
        dense = self.dense_cls or _default_dense
        h = LargeAtariCNN(n_output_channels=512, activation=self.activation)(x)
        a = dense(self.n_actions)(h)
        v = dense(1)(h)
        a_centered = a - jnp.mean(a, axis=-1, keepdims=True)
        return DiscreteActionValue(q_values=v + a_centered)


class DistributionalDuelingDQN(nn.Module):
    """Distributional dueling head for Rainbow (dueling_dqn.py:67-129)."""

    n_actions: int
    n_atoms: int
    v_min: float
    v_max: float
    activation: Callable = nn.relu
    dense_cls: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> DistributionalDiscreteActionValue:
        dense = self.dense_cls or _default_dense
        h = LargeAtariCNN(n_output_channels=512, activation=self.activation)(x)
        a = dense(self.n_actions * self.n_atoms)(h)
        a = a.reshape(-1, self.n_actions, self.n_atoms)
        v = dense(self.n_atoms)(h)[:, None, :]
        a_centered = a - jnp.mean(a, axis=1, keepdims=True)
        logits = v + a_centered
        q_dist = jax.nn.softmax(logits, axis=-1)
        z = jnp.linspace(self.v_min, self.v_max, self.n_atoms, dtype=jnp.float32)
        return DistributionalDiscreteActionValue(q_dist=q_dist, z_values=z)
