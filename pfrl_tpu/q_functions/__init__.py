"""Q-function model zoo (reference parity: pfrl/q_functions/)."""

from pfrl_tpu.q_functions.dueling_dqn import DistributionalDuelingDQN, DuelingDQN
from pfrl_tpu.q_functions.quantile_q_functions import (
    ImplicitQuantileQFunction,
    RecurrentImplicitQuantileQFunction,
)
from pfrl_tpu.q_functions.state_action_q_functions import (
    FCBNLateActionSAQFunction,
    FCBNSAQFunction,
    FCLateActionSAQFunction,
    FCLSTMSAQFunction,
    FCSAQFunction,
    SingleModelStateActionQFunction,
)
from pfrl_tpu.q_functions.state_q_functions import (
    DiscreteActionValueHead,
    DistributionalFCStateQFunctionWithDiscreteAction,
    DistributionalSingleModelStateQFunctionWithDiscreteAction,
    FCQuadraticStateQFunction,
    FCStateQFunctionWithDiscreteAction,
    SingleModelStateQFunctionWithDiscreteAction,
)

__all__ = [
    "DistributionalDuelingDQN",
    "DuelingDQN",
    "ImplicitQuantileQFunction",
    "RecurrentImplicitQuantileQFunction",
    "FCBNLateActionSAQFunction",
    "FCBNSAQFunction",
    "FCLateActionSAQFunction",
    "FCLSTMSAQFunction",
    "FCSAQFunction",
    "SingleModelStateActionQFunction",
    "DiscreteActionValueHead",
    "DistributionalFCStateQFunctionWithDiscreteAction",
    "DistributionalSingleModelStateQFunctionWithDiscreteAction",
    "FCQuadraticStateQFunction",
    "FCStateQFunctionWithDiscreteAction",
    "SingleModelStateQFunctionWithDiscreteAction",
]
