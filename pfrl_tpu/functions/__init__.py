"""Differentiable helper functions (reference parity: pfrl/functions/)."""

from pfrl_tpu.functions.lower_triangular_matrix import lower_triangular_matrix

__all__ = ["lower_triangular_matrix"]
