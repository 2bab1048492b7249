"""Algorithm zoo (reference parity: pfrl/agents/)."""

from pfrl_tpu.agents.a2c import A2C, A2CCore
from pfrl_tpu.agents.a3c import A3C, A3CCore
from pfrl_tpu.agents.acer import ACERContinuousCore, ACERCore, ACERSDNModel
from pfrl_tpu.agents.al import AL, ALCore
from pfrl_tpu.agents.categorical_dqn import (
    CategoricalDQN,
    CategoricalDQNCore,
    CategoricalDoubleDQN,
    CategoricalDoubleDQNCore,
)
from pfrl_tpu.agents.ddpg import DDPG, DDPGCore
from pfrl_tpu.agents.double_dqn import DoubleDQN, DoubleDQNCore
from pfrl_tpu.agents.dpp import DPP, DPPCore
from pfrl_tpu.agents.dqn import DQN, DQNCore, DQNState
from pfrl_tpu.agents.iqn import IQN, DoubleIQN, DoubleIQNCore, IQNCore
from pfrl_tpu.agents.pal import PAL, DoublePAL, DoublePALCore, PALCore
from pfrl_tpu.agents.ppo import PPO, PPOCore
from pfrl_tpu.agents.recurrent_dqn import RecurrentDQNCore
from pfrl_tpu.agents.recurrent_iqn import RecurrentIQNCore
from pfrl_tpu.agents.recurrent_ppo import RecurrentPPOCore
from pfrl_tpu.agents.recurrent_trpo import RecurrentTRPOCore
from pfrl_tpu.agents.reinforce import REINFORCE, ReinforceCore
from pfrl_tpu.agents.state_q_function_actor import StateQFunctionActor
from pfrl_tpu.agents.soft_actor_critic import SACCore, SoftActorCritic
from pfrl_tpu.agents.td3 import TD3, TD3Core
from pfrl_tpu.agents.trpo import TRPO, TRPOCore

__all__ = [
    "A2C",
    "A2CCore",
    "A3C",
    "A3CCore",
    "ACERContinuousCore",
    "ACERCore",
    "ACERSDNModel",
    "AL",
    "ALCore",
    "CategoricalDQN",
    "CategoricalDQNCore",
    "CategoricalDoubleDQN",
    "CategoricalDoubleDQNCore",
    "DDPG",
    "DDPGCore",
    "DoubleDQN",
    "DoubleDQNCore",
    "DPP",
    "DPPCore",
    "DQN",
    "DQNCore",
    "DQNState",
    "IQN",
    "DoubleIQN",
    "DoubleIQNCore",
    "IQNCore",
    "PAL",
    "DoublePAL",
    "DoublePALCore",
    "PALCore",
    "PPO",
    "PPOCore",
    "RecurrentDQNCore",
    "RecurrentIQNCore",
    "RecurrentPPOCore",
    "RecurrentTRPOCore",
    "REINFORCE",
    "ReinforceCore",
    "StateQFunctionActor",
    "SACCore",
    "SoftActorCritic",
    "TD3",
    "TD3Core",
    "TRPO",
    "TRPOCore",
]
