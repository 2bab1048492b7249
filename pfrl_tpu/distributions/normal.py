"""Diagonal Gaussian over continuous action vectors.

Backs the Gaussian policy heads (reference: pfrl/policies/gaussian_policy.py:6-120).
``log_prob`` sums over the trailing event dimension, matching the reference's
``torch.distributions.Independent(Normal, 1)`` convention.
"""

import math

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.distributions.base import Distribution

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


@struct.dataclass
class Normal(Distribution):
    loc: jax.Array
    scale: jax.Array

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.rsample(rng)

    def rsample(self, rng: jax.Array) -> jax.Array:
        eps = jax.random.normal(rng, self.loc.shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, value: jax.Array) -> jax.Array:
        log_scale = jnp.log(self.scale)
        z = (value - self.loc) / self.scale
        per_dim = -0.5 * z * z - log_scale - _LOG_SQRT_2PI
        return jnp.sum(per_dim, axis=-1)

    def entropy(self) -> jax.Array:
        per_dim = 0.5 + _LOG_SQRT_2PI + jnp.log(self.scale)
        return jnp.sum(per_dim, axis=-1)

    def mode(self) -> jax.Array:
        return self.loc

    def mean(self) -> jax.Array:
        return self.loc

    def kl(self, other: "Normal") -> jax.Array:
        var_ratio = (self.scale / other.scale) ** 2
        t1 = ((self.loc - other.loc) / other.scale) ** 2
        per_dim = 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
        return jnp.sum(per_dim, axis=-1)
