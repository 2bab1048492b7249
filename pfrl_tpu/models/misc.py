"""Small glue modules (reference parity: pfrl/nn/bound_by_tanh.py, concat_obs_and_action.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp


class BoundByTanh(nn.Module):
    """Squash into [low, high] via tanh (pfrl/nn/bound_by_tanh.py)."""

    low: tuple
    high: tuple

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        low = jnp.asarray(self.low, jnp.float32)
        high = jnp.asarray(self.high, jnp.float32)
        scale = (high - low) / 2.0
        center = (high + low) / 2.0
        return jnp.tanh(x) * scale + center


class ConcatObsAndAction(nn.Module):
    """Concat (s, a) along the feature axis (pfrl/nn/concat_obs_and_action.py)."""

    def __call__(self, obs: jax.Array, action: jax.Array) -> jax.Array:
        return jnp.concatenate([obs, action], axis=-1)
