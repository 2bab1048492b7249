"""(state, action)-input Q-functions (reference parity: pfrl/q_functions/state_action_q_functions.py)."""

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu.models.mlp import MLP, MLPBN


class FCSAQFunction(nn.Module):
    """MLP over concat(s, a) -> scalar Q (state_action_q_functions.py:9-36)."""

    n_hidden_channels: int = 64
    n_hidden_layers: int = 2
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(self, obs: jax.Array, action: jax.Array) -> jax.Array:
        h = jnp.concatenate([obs, action], axis=-1)
        q = MLP(
            out_size=1,
            hidden_sizes=(self.n_hidden_channels,) * self.n_hidden_layers,
            nonlinearity=self.nonlinearity,
            last_wscale=self.last_wscale,
        )(h)
        return q[..., 0]


class FCBNSAQFunction(nn.Module):
    """Batch-normalized variant (state_action_q_functions.py:39-72)."""

    n_hidden_channels: int = 64
    n_hidden_layers: int = 2
    normalize_input: bool = True

    @nn.compact
    def __call__(self, obs: jax.Array, action: jax.Array, train: bool = True) -> jax.Array:
        h = jnp.concatenate([obs, action], axis=-1)
        q = MLPBN(
            out_size=1,
            hidden_sizes=(self.n_hidden_channels,) * self.n_hidden_layers,
            normalize_input=self.normalize_input,
        )(h, train=train)
        return q[..., 0]
