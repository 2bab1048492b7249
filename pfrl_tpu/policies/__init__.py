"""Policy head modules (reference parity: pfrl/policies/)."""

from pfrl_tpu.policies.deterministic_policy import DeterministicHead
from pfrl_tpu.policies.gaussian_policy import (
    GaussianHeadWithDiagonalCovariance,
    GaussianHeadWithFixedCovariance,
    GaussianHeadWithStateIndependentCovariance,
    SquashedGaussianHead,
)
from pfrl_tpu.policies.softmax_policy import SoftmaxCategoricalHead

__all__ = [
    "DeterministicHead",
    "GaussianHeadWithDiagonalCovariance",
    "GaussianHeadWithFixedCovariance",
    "GaussianHeadWithStateIndependentCovariance",
    "SquashedGaussianHead",
    "SoftmaxCategoricalHead",
]
