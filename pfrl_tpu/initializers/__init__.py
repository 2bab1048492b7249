"""Weight initializers (reference parity: pfrl/initializers/).

The Chainer-default initialization (untruncated LeCun-normal weights, zero
biases — pfrl/initializers/chainer_default.py:9-21) is load-bearing for
score reproduction, so it is the default everywhere in the model zoo. Note
``jax.nn.initializers.lecun_normal`` is *truncated* normal — not the same
distribution — hence the explicit variance_scaling("normal") here.
"""

import jax


def lecun_normal(scale: float = 1.0):
    """Untruncated LeCun normal: std = sqrt(scale / fan_in)."""
    return jax.nn.initializers.variance_scaling(
        scale, mode="fan_in", distribution="normal"
    )


def chainer_default_w(scale: float = 1.0):
    """Weight init matching Chainer's default (what pfrl trained with)."""
    return lecun_normal(scale)


zeros = jax.nn.initializers.zeros
"""Bias init matching Chainer's default."""


def constant_bias(value: float):
    return jax.nn.initializers.constant(value)
