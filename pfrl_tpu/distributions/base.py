"""Distribution protocol (see pfrl_tpu.distributions package docstring)."""

from typing import Tuple

import jax


class Distribution:
    """Interface all pfrl_tpu distributions implement.

    Batch shape is implicit: every method maps over leading dimensions of the
    parameter arrays. ``log_prob`` sums over event dimensions (like
    ``torch.distributions.Independent`` with one event dim for vector
    actions), which is the convention every pfrl policy head relied on.
    """

    def sample(self, rng: jax.Array) -> jax.Array:
        raise NotImplementedError

    def rsample(self, rng: jax.Array) -> jax.Array:
        """Reparameterized sample (falls back to sample)."""
        return self.sample(rng)

    def sample_and_log_prob(self, rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = self.rsample(rng)
        return x, self.log_prob(x)

    def log_prob(self, value: jax.Array) -> jax.Array:
        raise NotImplementedError

    def entropy(self) -> jax.Array:
        raise NotImplementedError

    def mode(self) -> jax.Array:
        raise NotImplementedError

    def mean(self) -> jax.Array:
        raise NotImplementedError
