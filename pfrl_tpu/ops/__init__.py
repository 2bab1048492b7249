"""Core RL compute kernels.

The reference buries its math inside agent methods; here every loss /
return / projection is a standalone pure function so (a) agents stay thin,
(b) exact-value unit tests pin them against numpy references (SURVEY.md §4),
and (c) XLA fuses them into the surrounding update step.
"""

from pfrl_tpu.ops.categorical import categorical_projection
from pfrl_tpu.ops.quantile import (
    cosine_basis_functions,
    quantile_huber_loss,
)
from pfrl_tpu.ops.returns import (
    discounted_returns,
    gae_advantages,
    lambda_returns,
    n_step_returns_from_window,
)
from pfrl_tpu.ops.value_loss import (
    compute_value_loss,
    compute_weighted_value_loss,
    huber_loss,
)

__all__ = [
    "categorical_projection",
    "cosine_basis_functions",
    "quantile_huber_loss",
    "discounted_returns",
    "gae_advantages",
    "lambda_returns",
    "n_step_returns_from_window",
    "compute_value_loss",
    "compute_weighted_value_loss",
    "huber_loss",
]
