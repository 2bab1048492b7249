"""Differentiable helper functions (reference parity: pfrl/functions/)."""

from pfrl_tpu.functions.bound_by_tanh import bound_by_tanh
from pfrl_tpu.functions.lower_triangular_matrix import lower_triangular_matrix

__all__ = ["bound_by_tanh", "lower_triangular_matrix"]
