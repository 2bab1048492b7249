"""Parallel branch container (reference parity: pfrl/nn/branched.py:4-30)."""

from typing import Sequence, Tuple

import flax.linen as nn


class Branched(nn.Module):
    """Apply each child module to the same input; return the tuple of outputs.

    The actor-critic model zoo uses this for shared-torso pi/v heads.
    """

    branches: Sequence[nn.Module]

    @nn.compact
    def __call__(self, *args, **kwargs) -> Tuple:
        return tuple(branch(*args, **kwargs) for branch in self.branches)
