"""Lambda module (reference parity: pfrl/nn/lmbda.py)."""

from typing import Callable

import flax.linen as nn


class Lambda(nn.Module):
    """Wrap any traceable function as a parameterless module."""

    f: Callable

    def __call__(self, *args, **kwargs):
        return self.f(*args, **kwargs)
