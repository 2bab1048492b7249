"""RMSprop with epsilon inside the sqrt.

Reference parity: pfrl/optimizers/rmsprop_eps_inside_sqrt.py:5-83. Standard
RMSprop divides by ``sqrt(v) + eps``; Nature DQN's original Torch7 RMSprop
divides by ``sqrt(v + eps)``, which changes early-training dynamics enough
to matter for score reproduction.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class RMSpropEISState(NamedTuple):
    square_avg: Any
    momentum_buf: Any
    grad_avg: Any


def rmsprop_eps_inside_sqrt(
    learning_rate: float,
    alpha: float = 0.99,
    eps: float = 1e-8,
    momentum: float = 0.0,
    centered: bool = False,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RMSpropEISState(
            square_avg=zeros,
            momentum_buf=jax.tree.map(jnp.zeros_like, params) if momentum > 0 else (),
            grad_avg=jax.tree.map(jnp.zeros_like, params) if centered else (),
        )

    def update_fn(grads, state, params=None):
        del params
        square_avg = jax.tree.map(
            lambda v, g: alpha * v + (1 - alpha) * g * g, state.square_avg, grads
        )
        if centered:
            grad_avg = jax.tree.map(
                lambda m, g: alpha * m + (1 - alpha) * g, state.grad_avg, grads
            )
            avg = jax.tree.map(
                lambda v, m: jnp.sqrt(v - m * m + eps), square_avg, grad_avg
            )
        else:
            grad_avg = state.grad_avg
            avg = jax.tree.map(lambda v: jnp.sqrt(v + eps), square_avg)

        scaled = jax.tree.map(lambda g, a: g / a, grads, avg)
        if momentum > 0:
            momentum_buf = jax.tree.map(
                lambda b, s: momentum * b + s, state.momentum_buf, scaled
            )
            updates = jax.tree.map(lambda b: -learning_rate * b, momentum_buf)
        else:
            momentum_buf = state.momentum_buf
            updates = jax.tree.map(lambda s: -learning_rate * s, scaled)
        return updates, RMSpropEISState(
            square_avg=square_avg, momentum_buf=momentum_buf, grad_avg=grad_avg
        )

    return optax.GradientTransformation(init_fn, update_fn)
