"""Minimal jit-native probability distributions.

Replaces the reference's use of ``torch.distributions`` (policy heads in
pfrl/policies/, Delta in pfrl/distributions/delta.py:7-62). Each distribution
is a flax.struct pytree — it can live inside jitted functions, be returned
from flax modules, be vmapped, and be stored in carry state. Reparameterized
sampling (``rsample``) is the default wherever defined.
"""

from pfrl_tpu.distributions.base import Distribution
from pfrl_tpu.distributions.categorical import Categorical
from pfrl_tpu.distributions.delta import Delta
from pfrl_tpu.distributions.normal import Normal
from pfrl_tpu.distributions.squashed_normal import SquashedNormal
from pfrl_tpu.distributions.transforms import kl_divergence

__all__ = [
    "Distribution",
    "Categorical",
    "Delta",
    "Normal",
    "SquashedNormal",
    "kl_divergence",
]
