"""Atari CNN torsos (reference parity: pfrl/nn/atari_cnn.py:17-79).

NHWC layout (TPU-native; conv lowering prefers channels-last) vs the
reference's NCHW. Inputs are ``[B, 84, 84, stack]`` float in [0, 1]; uint8
scaling happens in the agent's ``phi``. Convs map onto the MXU via XLA;
keeping the whole torso one fused region is faster than any hand scheduling
at these sizes.
"""

from typing import Callable, Sequence

import flax.linen as nn
import jax

from pfrl_tpu import initializers


class LargeAtariCNN(nn.Module):
    """Nature-DQN torso: 32x8x8/4, 64x4x4/2, 64x3x3/1, dense 512."""

    n_output_channels: int = 512
    activation: Callable = nn.relu
    bias: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        convs = [(32, (8, 8), (4, 4)), (64, (4, 4), (2, 2)), (64, (3, 3), (1, 1))]
        for features, kernel, stride in convs:
            x = nn.Conv(
                features,
                kernel,
                strides=stride,
                padding="VALID",
                kernel_init=initializers.chainer_default_w(),
                bias_init=initializers.constant_bias(self.bias),
            )(x)
            x = self.activation(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(
            self.n_output_channels,
            kernel_init=initializers.chainer_default_w(),
            bias_init=initializers.constant_bias(self.bias),
        )(x)
        return self.activation(x)


class SmallAtariCNN(nn.Module):
    """NIPS'13 DQN torso: 16x8x8/4, 32x4x4/2, dense 256."""

    n_output_channels: int = 256
    activation: Callable = nn.relu
    bias: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        convs = [(16, (8, 8), (4, 4)), (32, (4, 4), (2, 2))]
        for features, kernel, stride in convs:
            x = nn.Conv(
                features,
                kernel,
                strides=stride,
                padding="VALID",
                kernel_init=initializers.chainer_default_w(),
                bias_init=initializers.constant_bias(self.bias),
            )(x)
            x = self.activation(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(
            self.n_output_channels,
            kernel_init=initializers.chainer_default_w(),
            bias_init=initializers.constant_bias(self.bias),
        )(x)
        return self.activation(x)
