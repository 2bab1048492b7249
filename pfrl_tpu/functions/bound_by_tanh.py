"""Bound values into [low, high] by tanh (reference parity:
pfrl/functions/bound_by_tanh.py:4-22)."""

import jax.numpy as jnp


def bound_by_tanh(x, low, high):
    """``tanh(x)`` affinely rescaled so its range is exactly
    ``[low, high]`` (elementwise; ``low``/``high`` broadcast against
    ``x``). Differentiable — the squash the DDPG-style deterministic
    policies use to respect box action bounds (see also the
    :class:`pfrl_tpu.models.BoundByTanh` module wrapper)."""
    assert low is not None
    assert high is not None
    low = jnp.asarray(low, dtype=x.dtype)
    high = jnp.asarray(high, dtype=x.dtype)
    scale = (high - low) / 2
    loc = (high + low) / 2
    return jnp.tanh(x) * scale + loc
