"""Categorical distribution over discrete actions.

Backs SoftmaxCategoricalHead (reference: pfrl/policies/softmax_policy.py:5-7)
and ACER's discrete machinery.
"""

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.distributions.base import Distribution


@struct.dataclass
class Categorical(Distribution):
    """Parameterized by unnormalized logits ``[..., n]``."""

    logits: jax.Array

    @property
    def log_probs(self) -> jax.Array:
        return jax.nn.log_softmax(self.logits, axis=-1)

    @property
    def probs(self) -> jax.Array:
        return jax.nn.softmax(self.logits, axis=-1)

    def sample(self, rng: jax.Array) -> jax.Array:
        return jax.random.categorical(rng, self.logits, axis=-1)

    def log_prob(self, value: jax.Array) -> jax.Array:
        lp = self.log_probs
        return jnp.take_along_axis(
            lp, value[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def entropy(self) -> jax.Array:
        lp = self.log_probs
        return -jnp.sum(jnp.exp(lp) * lp, axis=-1)

    def mode(self) -> jax.Array:
        return jnp.argmax(self.logits, axis=-1)

    def mean(self) -> jax.Array:  # mean of the index variable is ill-defined; use mode
        return self.mode()

    def kl(self, other: "Categorical") -> jax.Array:
        lp, lq = self.log_probs, other.log_probs
        return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)
