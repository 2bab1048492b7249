"""Deterministic (Dirac delta) distribution.

Reference parity: pfrl/distributions/delta.py:7-62 — used by
DeterministicHead for DDPG/TD3 policies.
"""

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.distributions.base import Distribution


@struct.dataclass
class Delta(Distribution):
    loc: jax.Array

    def sample(self, rng: jax.Array) -> jax.Array:
        del rng
        return self.loc

    def rsample(self, rng: jax.Array) -> jax.Array:
        del rng
        return self.loc

    def log_prob(self, value: jax.Array) -> jax.Array:
        # Matches the reference's convention: 0 where equal (log of prob 1)
        # summed over the event dim, -inf elsewhere.
        eq = jnp.all(value == self.loc, axis=-1)
        return jnp.where(eq, 0.0, -jnp.inf)

    def entropy(self) -> jax.Array:
        return jnp.zeros(self.loc.shape[:-1], self.loc.dtype)

    def mode(self) -> jax.Array:
        return self.loc

    def mean(self) -> jax.Array:
        return self.loc
