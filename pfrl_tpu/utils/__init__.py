"""Shared utilities (reference parity: pfrl/utils/)."""

from pfrl_tpu.utils.ask_yes_no import ask_yes_no
from pfrl_tpu.utils.batch_states import atari_phi, batch_states
from pfrl_tpu.utils.clip_l2_grad_norm import clip_l2_grad_norm
from pfrl_tpu.utils.conjugate_gradient import conjugate_gradient
from pfrl_tpu.utils.copy_param import (
    copy_param,
    soft_copy_param,
    synchronize_parameters,
)
from pfrl_tpu.utils.contexts import evaluating, set_temporarily
from pfrl_tpu.utils.is_return_code_zero import is_return_code_zero
from pfrl_tpu.utils.mode_of_distribution import mode_of_distribution
from pfrl_tpu.utils.profiling import StepTimer, trace
from pfrl_tpu.utils.pytree import (
    tree_replace,
    tree_select,
    tree_stack,
    tree_unstack,
    tree_where,
    tree_zeros_like_batched,
)
from pfrl_tpu.utils.random import sample_n_k
from pfrl_tpu.utils.reward_filter import (
    AverageRewardFilter,
    NormalizedRewardFilter,
)
from pfrl_tpu.utils.random_seed import set_random_seed
from pfrl_tpu.utils.stats import RunningStats
from pfrl_tpu.utils.stoppable_thread import Counter, StoppableThread

__all__ = [
    "ask_yes_no",
    "atari_phi",
    "batch_states",
    "evaluating",
    "set_temporarily",
    "is_return_code_zero",
    "AverageRewardFilter",
    "NormalizedRewardFilter",
    "clip_l2_grad_norm",
    "conjugate_gradient",
    "copy_param",
    "soft_copy_param",
    "synchronize_parameters",
    "mode_of_distribution",
    "StepTimer",
    "trace",
    "tree_replace",
    "tree_select",
    "tree_stack",
    "tree_unstack",
    "tree_where",
    "tree_zeros_like_batched",
    "sample_n_k",
    "set_random_seed",
    "RunningStats",
]
