"""Tanh-squashed diagonal Gaussian (SAC policy head).

The reference builds this as ``TransformedDistribution(Normal, TanhTransform)``
(pfrl examples / soft_actor_critic usage). Here the squash and its log-det
Jacobian are fused analytically: ``log(1 - tanh(u)^2) = 2*(log2 - u - softplus(-2u))``,
the numerically-stable form, evaluated on the pre-squash value so no atanh is
needed on the sampled path.
"""

import math

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.distributions.base import Distribution
from pfrl_tpu.distributions.normal import Normal

_LOG2 = math.log(2.0)


@struct.dataclass
class SquashedNormal(Distribution):
    loc: jax.Array
    scale: jax.Array

    def _base(self) -> Normal:
        return Normal(loc=self.loc, scale=self.scale)

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.rsample(rng)

    def rsample(self, rng: jax.Array) -> jax.Array:
        return jnp.tanh(self._base().rsample(rng))

    def sample_and_log_prob(self, rng: jax.Array):
        """Sample with the log-prob computed from the pre-squash value.

        This is the stable path SAC uses for its policy update; computing
        log_prob(atanh(x)) after the fact loses precision near |x|=1.
        """
        u = self._base().rsample(rng)
        x = jnp.tanh(u)
        base_lp = self._base().log_prob(u)
        log_det = jnp.sum(
            2.0 * (_LOG2 - u - jax.nn.softplus(-2.0 * u)), axis=-1
        )
        return x, base_lp - log_det

    def log_prob(self, value: jax.Array) -> jax.Array:
        eps = 1e-6
        clipped = jnp.clip(value, -1.0 + eps, 1.0 - eps)
        u = jnp.arctanh(clipped)
        base_lp = self._base().log_prob(u)
        log_det = jnp.sum(
            2.0 * (_LOG2 - u - jax.nn.softplus(-2.0 * u)), axis=-1
        )
        return base_lp - log_det

    def mode(self) -> jax.Array:
        return jnp.tanh(self.loc)

    def mean(self) -> jax.Array:
        return jnp.tanh(self.loc)  # approximation; exact mean has no closed form

    def entropy(self) -> jax.Array:
        # No closed form; SAC estimates it with -log_prob of samples.
        raise NotImplementedError(
            "SquashedNormal entropy has no closed form; use -log_prob(sample)."
        )
