"""Additive Gaussian action noise (reference parity: pfrl/explorers/additive_gaussian.py:6-37)."""

import jax
import jax.numpy as jnp

from pfrl_tpu.explorer import Explorer


class AdditiveGaussian(Explorer):
    def __init__(self, scale: float, low=None, high=None):
        self.scale = scale
        self.low = low
        self.high = high

    def select_action(self, rng, t, greedy_actions, action_value=None):
        noise = jax.random.normal(rng, greedy_actions.shape) * self.scale
        a = greedy_actions + noise
        if self.low is not None or self.high is not None:
            a = jnp.clip(
                a,
                -jnp.inf if self.low is None else jnp.asarray(self.low),
                jnp.inf if self.high is None else jnp.asarray(self.high),
            )
        return a
