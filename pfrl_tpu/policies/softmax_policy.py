"""Categorical policy head (reference parity: pfrl/policies/softmax_policy.py:5-7)."""

import flax.linen as nn
import jax

from pfrl_tpu.distributions import Categorical


class SoftmaxCategoricalHead(nn.Module):
    def __call__(self, logits: jax.Array) -> Categorical:
        return Categorical(logits=logits)
