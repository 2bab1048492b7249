"""Deterministic policy head (reference parity: pfrl/policies/deterministic_policy.py:7-11)."""

import flax.linen as nn
import jax

from pfrl_tpu.distributions import Delta


class DeterministicHead(nn.Module):
    def __call__(self, loc: jax.Array) -> Delta:
        return Delta(loc=loc)
