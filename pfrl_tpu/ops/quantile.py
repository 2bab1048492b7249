"""IQN quantile machinery.

Reference parity: pfrl/agents/iqn.py:11-60 (cosine basis tau embedding) and
iqn.py:176-255 (elementwise quantile Huber + batch accumulation). The
(N, N') pairwise loss is one broadcasted elementwise block — VPU work XLA
fuses with the reductions.
"""

import math

import jax
import jax.numpy as jnp

from pfrl_tpu.ops.value_loss import huber_loss


def cosine_basis_functions(x: jax.Array, n_basis_functions: int = 64) -> jax.Array:
    """phi(tau)_i = cos(i * pi * tau), i = 1..n (iqn.py:11-26).

    Input ``[...]`` -> output ``[..., n_basis_functions]``.
    """
    i_pi = (
        jnp.arange(1, n_basis_functions + 1, dtype=jnp.float32) * math.pi
    )
    return jnp.cos(x[..., None] * i_pi)


def eltwise_huber_quantile_loss(
    y: jax.Array, t: jax.Array, taus: jax.Array
) -> jax.Array:
    """Pairwise quantile Huber loss ``[B, N, N']`` (iqn.py:176-212).

    y: predictions ``[B, N]`` at thresholds taus ``[B, N]``;
    t: targets ``[B, N']``.
    """
    y_ = y[:, :, None]
    t_ = t[:, None, :]
    taus_ = taus[:, :, None]
    indicator = (t_ < y_).astype(y.dtype)
    return jnp.abs(taus_ - indicator) * huber_loss(y_ - t_)


def quantile_loss_accumulate(
    eltwise_loss: jax.Array, batch_accumulator: str = "mean"
) -> jax.Array:
    """Reduce ``[B, N, N']`` to scalar (iqn.py:215-236)."""
    assert batch_accumulator in ("mean", "sum")
    if batch_accumulator == "sum":
        return jnp.sum(jnp.mean(eltwise_loss, axis=2))
    return jnp.sum(jnp.mean(eltwise_loss, axis=(0, 2)))


def weighted_quantile_loss_accumulate(
    eltwise_loss: jax.Array, weights: jax.Array, batch_accumulator: str = "mean"
) -> jax.Array:
    """PER-weighted reduction (iqn.py:239-255)."""
    assert batch_accumulator in ("mean", "sum")
    per_example = jnp.sum(jnp.mean(eltwise_loss, axis=2), axis=1)
    loss_sum = jnp.dot(per_example, weights)
    if batch_accumulator == "mean":
        return loss_sum / eltwise_loss.shape[0]
    return loss_sum


def quantile_huber_loss(
    y: jax.Array,
    t: jax.Array,
    taus: jax.Array,
    weights: jax.Array = None,
    batch_accumulator: str = "mean",
) -> jax.Array:
    """Convenience: pairwise loss + accumulation in one call."""
    el = eltwise_huber_quantile_loss(y, jax.lax.stop_gradient(t), taus)
    if weights is not None:
        return weighted_quantile_loss_accumulate(el, weights, batch_accumulator)
    return quantile_loss_accumulate(el, batch_accumulator)
