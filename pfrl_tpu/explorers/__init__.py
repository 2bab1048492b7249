"""Exploration strategies (reference parity: pfrl/explorers/)."""

from pfrl_tpu.explorers.additive_gaussian import AdditiveGaussian
from pfrl_tpu.explorers.additive_ou import AdditiveOU
from pfrl_tpu.explorers.boltzmann import Boltzmann
from pfrl_tpu.explorers.epsilon_greedy import (
    ConstantEpsilonGreedy,
    ExponentialDecayEpsilonGreedy,
    LinearDecayEpsilonGreedy,
)
from pfrl_tpu.explorers.greedy import Greedy

__all__ = [
    "AdditiveGaussian",
    "AdditiveOU",
    "Boltzmann",
    "ConstantEpsilonGreedy",
    "ExponentialDecayEpsilonGreedy",
    "LinearDecayEpsilonGreedy",
    "Greedy",
]
