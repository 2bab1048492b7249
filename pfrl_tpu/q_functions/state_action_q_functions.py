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


class SingleModelStateActionQFunction(nn.Module):
    """Wrap any ``(s, a) -> Q`` module under the StateActionQFunction
    protocol (state_action_q_functions.py:11-24)."""

    model: nn.Module

    @nn.compact
    def __call__(self, obs: jax.Array, action: jax.Array) -> jax.Array:
        q = self.model(obs, action)
        return q[..., 0] if q.ndim > obs.ndim - 1 and q.shape[-1] == 1 else q


class FCLateActionSAQFunction(nn.Module):
    """Late-action-input Q-function (DDPG-paper architecture,
    state_action_q_functions.py:234-296): the observation passes through
    the first hidden layer alone; the action joins at the second."""

    n_hidden_channels: int = 64
    n_hidden_layers: int = 2
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(self, obs: jax.Array, action: jax.Array) -> jax.Array:
        assert self.n_hidden_layers >= 1
        h = self.nonlinearity(
            MLP(out_size=self.n_hidden_channels, hidden_sizes=())(obs)
        )
        h = jnp.concatenate([h, action], axis=-1)
        q = MLP(
            out_size=1,
            hidden_sizes=(self.n_hidden_channels,)
            * (self.n_hidden_layers - 1),
            nonlinearity=self.nonlinearity,
            last_wscale=self.last_wscale,
        )(h)
        return q[..., 0]


class FCBNLateActionSAQFunction(nn.Module):
    """Late-action variant with BN on the observation path only (actions
    are never normalized; state_action_q_functions.py:170-231)."""

    n_hidden_channels: int = 64
    n_hidden_layers: int = 2
    normalize_input: bool = True
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(
        self, obs: jax.Array, action: jax.Array, train: bool = True
    ) -> jax.Array:
        assert self.n_hidden_layers >= 1
        h = self.nonlinearity(
            MLPBN(
                out_size=self.n_hidden_channels,
                hidden_sizes=(),
                normalize_input=self.normalize_input,
                normalize_output=True,
            )(obs, train=train)
        )
        h = jnp.concatenate([h, action], axis=-1)
        q = MLP(
            out_size=1,
            hidden_sizes=(self.n_hidden_channels,)
            * (self.n_hidden_layers - 1),
            nonlinearity=self.nonlinearity,
            last_wscale=self.last_wscale,
        )(h)
        return q[..., 0]


class FCLSTMSAQFunction(nn.Module):
    """Recurrent (s,a)-input Q-function. The reference declares this class
    but stubs it with ``raise NotImplementedError()``
    (state_action_q_functions.py:92-96); here it is a working
    recurrent-protocol module: ``apply(params, obs, action, carry) ->
    (q, carry')`` with ``initial_carry(batch_size)``."""

    n_hidden_channels: int = 64
    n_hidden_layers: int = 2
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(self, obs, action, carry):
        from pfrl_tpu.models.recurrent import LSTMCellModule

        h = jnp.concatenate([obs, action], axis=-1)
        h = self.nonlinearity(
            MLP(
                out_size=self.n_hidden_channels,
                hidden_sizes=(self.n_hidden_channels,)
                * self.n_hidden_layers,
                nonlinearity=self.nonlinearity,
            )(h)
        )
        h, new_carry = LSTMCellModule(self.n_hidden_channels)(h, carry[0])
        q = MLP(out_size=1, hidden_sizes=(), last_wscale=self.last_wscale)(h)
        return q[..., 0], (new_carry,)

    def initial_carry(self, batch_size: int):
        return (
            (
                jnp.zeros((batch_size, self.n_hidden_channels), jnp.float32),
                jnp.zeros((batch_size, self.n_hidden_channels), jnp.float32),
            ),
        )
