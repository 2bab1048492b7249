"""Ornstein-Uhlenbeck action noise (reference parity: pfrl/explorers/additive_ou.py:8-60).

The OU process is stateful; the reference hides the state in the explorer
object. Here the state is an explicit array the agent carries through its
jitted act step (``init_state`` / ``select_action_stateful``), so the whole
act remains a pure function. ``select_action`` (protocol form) falls back to
plain Gaussian noise for callers that cannot thread state.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.explorer import Explorer


class AdditiveOU(Explorer):
    def __init__(self, mu: float = 0.0, theta: float = 0.15, sigma: float = 0.3):
        self.mu = mu
        self.theta = theta
        self.sigma = sigma

    def init_state(self, shape) -> jax.Array:
        return jnp.zeros(shape, jnp.float32)

    def select_action_stateful(self, rng, state, greedy_actions):
        noise = jax.random.normal(rng, state.shape)
        new_state = (
            state + self.theta * (self.mu - state) + self.sigma * noise
        )
        return greedy_actions + new_state, new_state

    def select_action(self, rng, t, greedy_actions, action_value=None):
        noise = jax.random.normal(rng, greedy_actions.shape) * self.sigma
        return greedy_actions + noise
