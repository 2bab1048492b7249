"""ActionValue structs returned by Q-networks.

Reference parity: pfrl/action_value.py:44,97,183,232,327. Each variant is a
flax.struct pytree, so Q-functions can return them from jitted/vmapped code
and agents can pattern-match on the type statically (the type is part of the
trace, the arrays are the leaves). All accessors are batched: leading
dimension is the batch.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


class ActionValue:
    """Interface: greedy_actions / max / evaluate_actions / params."""

    def greedy_actions(self) -> jax.Array:
        raise NotImplementedError

    def max(self) -> jax.Array:
        raise NotImplementedError

    def evaluate_actions(self, actions: jax.Array) -> jax.Array:
        raise NotImplementedError


@struct.dataclass
class DiscreteActionValue(ActionValue):
    """Plain Q-values over discrete actions ``[B, A]``.

    Reference: pfrl/action_value.py:44-94.
    """

    q_values: jax.Array

    @property
    def n_actions(self) -> int:
        return self.q_values.shape[-1]

    def greedy_actions(self) -> jax.Array:
        return jnp.argmax(self.q_values, axis=-1).astype(jnp.int32)

    def max(self) -> jax.Array:
        return jnp.max(self.q_values, axis=-1)

    def evaluate_actions(self, actions: jax.Array) -> jax.Array:
        return jnp.take_along_axis(
            self.q_values, actions[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    @property
    def params(self):
        return (self.q_values,)


@struct.dataclass
class DistributionalDiscreteActionValue(ActionValue):
    """C51-style categorical return distributions.

    ``q_dist``: ``[B, A, n_atoms]`` probabilities; ``z_values``: ``[n_atoms]``
    support. Reference: pfrl/action_value.py:97-180.
    """

    q_dist: jax.Array
    z_values: jax.Array

    @property
    def q_values(self) -> jax.Array:
        return jnp.sum(self.q_dist * self.z_values, axis=-1)

    def greedy_actions(self) -> jax.Array:
        return jnp.argmax(self.q_values, axis=-1).astype(jnp.int32)

    def max(self) -> jax.Array:
        return jnp.max(self.q_values, axis=-1)

    def max_as_distribution(self) -> jax.Array:
        """Return distribution of the greedy action, ``[B, n_atoms]``."""
        a = self.greedy_actions()
        return jnp.take_along_axis(
            self.q_dist, a[:, None, None], axis=1
        )[:, 0, :]

    def evaluate_actions(self, actions: jax.Array) -> jax.Array:
        return jnp.take_along_axis(
            self.q_values, actions[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def evaluate_actions_as_distribution(self, actions: jax.Array) -> jax.Array:
        return jnp.take_along_axis(
            self.q_dist, actions[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]

    @property
    def params(self):
        return (self.q_dist,)


@struct.dataclass
class QuantileDiscreteActionValue(ActionValue):
    """IQN-style quantile value estimates ``[B, n_taus, A]``.

    Reference: pfrl/action_value.py:183-229.
    """

    quantiles: jax.Array

    @property
    def q_values(self) -> jax.Array:
        return jnp.mean(self.quantiles, axis=1)

    def greedy_actions(self) -> jax.Array:
        return jnp.argmax(self.q_values, axis=-1).astype(jnp.int32)

    def max(self) -> jax.Array:
        return jnp.max(self.q_values, axis=-1)

    def evaluate_actions(self, actions: jax.Array) -> jax.Array:
        return jnp.take_along_axis(
            self.q_values, actions[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def evaluate_actions_as_quantiles(self, actions: jax.Array) -> jax.Array:
        """Quantiles of given actions, ``[B, n_taus]``."""
        return jnp.take_along_axis(
            self.quantiles, actions[:, None, None].astype(jnp.int32), axis=2
        )[..., 0]

    @property
    def params(self):
        return (self.quantiles,)


@struct.dataclass
class QuadraticActionValue(ActionValue):
    """NAF quadratic Q: ``Q(s,a) = V - 0.5 (a-mu)^T P (a-mu)``.

    ``mu``: ``[B, d]``, ``mat``: ``[B, d, d]`` PSD, ``v``: ``[B]``; optional
    action bounds clip the greedy action. Reference: pfrl/action_value.py:232-324.
    """

    mu: jax.Array
    mat: jax.Array
    v: jax.Array
    min_action: Optional[jax.Array] = None
    max_action: Optional[jax.Array] = None

    def greedy_actions(self) -> jax.Array:
        a = self.mu
        if self.min_action is not None:
            a = jnp.maximum(a, self.min_action)
        if self.max_action is not None:
            a = jnp.minimum(a, self.max_action)
        return a

    def max(self) -> jax.Array:
        if self.min_action is None and self.max_action is None:
            return self.v
        return self.evaluate_actions(self.greedy_actions())

    def evaluate_actions(self, actions: jax.Array) -> jax.Array:
        d = actions - self.mu
        quad = jnp.einsum("bi,bij,bj->b", d, self.mat, d)
        return self.v - 0.5 * quad

    @property
    def params(self):
        return (self.mu, self.mat, self.v)


class SingleActionValue(ActionValue):
    """Q-values computable only per-action via an evaluator closure.

    Used by continuous actor-critics where argmax is delegated to the policy.
    Reference: pfrl/action_value.py:327-365. Not a pytree — it wraps a
    traced callable and only ever lives inside a single trace.
    """

    def __init__(
        self,
        evaluator: Callable[[jax.Array], jax.Array],
        maximizer: Optional[Callable[[], jax.Array]] = None,
    ):
        self.evaluator = evaluator
        self.maximizer = maximizer

    def greedy_actions(self) -> jax.Array:
        if self.maximizer is None:
            raise RuntimeError("SingleActionValue without maximizer")
        return self.maximizer()

    def max(self) -> jax.Array:
        return self.evaluator(self.greedy_actions())

    def evaluate_actions(self, actions: jax.Array) -> jax.Array:
        return self.evaluator(actions)
