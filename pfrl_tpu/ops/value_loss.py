"""TD value losses (reference parity: pfrl/agents/dqn.py:44-104).

``batch_accumulator`` in {"mean", "sum"} matters for reproduction: Nature
DQN effectively sums over the batch ("sum"), most later work means.
"""

import jax
import jax.numpy as jnp


def huber_loss(x: jax.Array, delta: float = 1.0) -> jax.Array:
    """Elementwise Huber: quadratic within |x|<=delta, linear outside."""
    abs_x = jnp.abs(x)
    quad = 0.5 * x * x
    lin = delta * (abs_x - 0.5 * delta)
    return jnp.where(abs_x <= delta, quad, lin)


def compute_value_loss(
    y: jax.Array,
    t: jax.Array,
    clip_delta: bool = True,
    batch_accumulator: str = "mean",
) -> jax.Array:
    """Loss between predicted values y and targets t (dqn.py:44-72)."""
    assert batch_accumulator in ("mean", "sum")
    diff = y - t
    per = huber_loss(diff) if clip_delta else 0.5 * diff * diff
    return jnp.sum(per) if batch_accumulator == "sum" else jnp.mean(per)


def compute_weighted_value_loss(
    y: jax.Array,
    t: jax.Array,
    weights: jax.Array,
    clip_delta: bool = True,
    batch_accumulator: str = "mean",
) -> jax.Array:
    """Per-sample-weighted loss for PER (dqn.py:75-104).

    Matches the reference: "mean" divides the weighted sum by batch size
    (weights are expected to be pre-normalized by the buffer).
    """
    assert batch_accumulator in ("mean", "sum")
    diff = y - t
    per = huber_loss(diff) if clip_delta else 0.5 * diff * diff
    weighted = per * weights
    if batch_accumulator == "mean":
        return jnp.sum(weighted) / y.shape[0]
    return jnp.sum(weighted)
