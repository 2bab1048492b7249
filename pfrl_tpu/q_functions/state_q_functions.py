"""State-input Q-functions (reference parity: pfrl/q_functions/state_q_functions.py)."""

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu.action_value import (
    DiscreteActionValue,
    DistributionalDiscreteActionValue,
    QuadraticActionValue,
)
from pfrl_tpu.functions import lower_triangular_matrix
from pfrl_tpu.models.mlp import MLP


class DiscreteActionValueHead(nn.Module):
    """[B, A] raw Q-values -> DiscreteActionValue (pfrl/q_functions/state_q_functions.py:237)."""

    def __call__(self, q: jax.Array) -> DiscreteActionValue:
        return DiscreteActionValue(q_values=q)


class FCStateQFunctionWithDiscreteAction(nn.Module):
    """MLP Q-function for discrete actions (state_q_functions.py:23-49)."""

    n_actions: int
    n_hidden_layers: int = 2
    n_hidden_channels: int = 64
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> DiscreteActionValue:
        q = MLP(
            out_size=self.n_actions,
            hidden_sizes=(self.n_hidden_channels,) * self.n_hidden_layers,
            nonlinearity=self.nonlinearity,
            last_wscale=self.last_wscale,
        )(x)
        return DiscreteActionValue(q_values=q)


class DistributionalFCStateQFunctionWithDiscreteAction(nn.Module):
    """C51 MLP Q-function (state_q_functions.py:52-101).

    Output is ``[B, A, n_atoms]`` softmax over atoms on a fixed support.
    """

    n_actions: int
    n_atoms: int
    v_min: float
    v_max: float
    n_hidden_layers: int = 2
    n_hidden_channels: int = 64
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> DistributionalDiscreteActionValue:
        h = MLP(
            out_size=self.n_actions * self.n_atoms,
            hidden_sizes=(self.n_hidden_channels,) * self.n_hidden_layers,
            nonlinearity=self.nonlinearity,
            last_wscale=self.last_wscale,
        )(x)
        logits = h.reshape(h.shape[0], self.n_actions, self.n_atoms)
        q_dist = jax.nn.softmax(logits, axis=-1)
        z = jnp.linspace(self.v_min, self.v_max, self.n_atoms, dtype=jnp.float32)
        return DistributionalDiscreteActionValue(q_dist=q_dist, z_values=z)


class FCQuadraticStateQFunction(nn.Module):
    """NAF quadratic Q-function (state_q_functions.py:144-215).

    The network emits V, mu, and the packed entries of a Cholesky factor L;
    the advantage matrix is ``L L^T`` — batched matmuls that XLA maps
    straight onto the MXU.
    """

    n_input_channels: int
    n_dim_action: int
    n_hidden_channels: int
    n_hidden_layers: int
    action_space_low: tuple
    action_space_high: tuple
    scale_mu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> QuadraticActionValue:
        d = self.n_dim_action
        n_tril = d * (d - 1) // 2
        out = MLP(
            out_size=1 + d + d + n_tril,
            hidden_sizes=(self.n_hidden_channels,) * self.n_hidden_layers,
        )(x)
        v = out[:, 0]
        mu = out[:, 1 : 1 + d]
        diag = jnp.exp(out[:, 1 + d : 1 + 2 * d])
        non_diag = out[:, 1 + 2 * d :]
        low = jnp.asarray(self.action_space_low, jnp.float32)
        high = jnp.asarray(self.action_space_high, jnp.float32)
        if self.scale_mu:
            scale = (high - low) / 2.0
            center = (high + low) / 2.0
            mu = jnp.tanh(mu) * scale + center
        tril = lower_triangular_matrix(diag, non_diag)
        mat = jnp.einsum(
            "bij,bkj->bik", tril, tril
        )  # L @ L.T, PSD by construction
        return QuadraticActionValue(
            mu=mu, mat=mat, v=v, min_action=low, max_action=high
        )


class SingleModelStateQFunctionWithDiscreteAction(nn.Module):
    """Wrap any ``x -> [B, A]`` module into a DiscreteActionValue Q-function
    (state_q_functions.py:26-40)."""

    model: nn.Module

    @nn.compact
    def __call__(self, x: jax.Array) -> DiscreteActionValue:
        return DiscreteActionValue(q_values=self.model(x))


class DistributionalSingleModelStateQFunctionWithDiscreteAction(nn.Module):
    """Wrap any ``x -> [B, A, n_atoms]`` module into a distributional
    Q-function over fixed atom supports (state_q_functions.py:75-94)."""

    model: nn.Module
    z_values: tuple  # (n_atoms,) return atoms, static

    @nn.compact
    def __call__(self, x: jax.Array) -> DistributionalDiscreteActionValue:
        probs = self.model(x)
        return DistributionalDiscreteActionValue(
            q_dist=probs, z_values=jnp.asarray(self.z_values, jnp.float32)
        )
