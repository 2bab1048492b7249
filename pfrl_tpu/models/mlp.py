"""MLP building blocks (reference parity: pfrl/nn/mlp.py:7-36, mlp_bn.py)."""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax

from pfrl_tpu import initializers


class MLP(nn.Module):
    """Fully-connected net with configurable hidden sizes and nonlinearity.

    Chainer-default init by default; ``last_wscale`` scales the final layer's
    init (many reference examples use 1e-2 heads for policy outputs).
    """

    out_size: int
    hidden_sizes: Sequence[int] = ()
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0
    last_bias_init: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for h in self.hidden_sizes:
            x = nn.Dense(
                h,
                kernel_init=initializers.chainer_default_w(),
                bias_init=initializers.zeros,
            )(x)
            x = self.nonlinearity(x)
        bias_init = (
            initializers.zeros
            if self.last_bias_init is None
            else initializers.constant_bias(self.last_bias_init)
        )
        return nn.Dense(
            self.out_size,
            kernel_init=initializers.chainer_default_w(self.last_wscale**2),
            bias_init=bias_init,
        )(x)


class MLPBN(nn.Module):
    """MLP with BatchNorm on input and/or hidden layers (pfrl/nn/mlp_bn.py).

    BatchNorm statistics are kept in the ``batch_stats`` collection; agents
    that use this module thread it through their TrainState.
    """

    out_size: int
    hidden_sizes: Sequence[int] = ()
    normalize_input: bool = True
    normalize_output: bool = False
    nonlinearity: Callable = nn.relu
    last_wscale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.normalize_input:
            x = nn.BatchNorm(use_running_average=not train)(x)
        for h in self.hidden_sizes:
            x = nn.Dense(
                h,
                kernel_init=initializers.chainer_default_w(),
                bias_init=initializers.zeros,
            )(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = self.nonlinearity(x)
        x = nn.Dense(
            self.out_size,
            kernel_init=initializers.chainer_default_w(self.last_wscale**2),
            bias_init=initializers.zeros,
        )(x)
        if self.normalize_output:
            x = nn.BatchNorm(use_running_average=not train)(x)
        return x
