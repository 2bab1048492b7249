"""NAF (DQN + quadratic Q) on continuous ABC
(mirrors the reference's continuous test_dqn parametrization,
q-function: pfrl/q_functions/state_q_functions.py:144-215)."""

import numpy as np
import optax

from pfrl_tpu.agents import DQNCore
from pfrl_tpu.explorers import AdditiveGaussian
from pfrl_tpu.q_functions import FCQuadraticStateQFunction
from pfrl_tpu.replay import ReplayBuffer

from tests.agents_tests.basetest_training import assert_optimal, train_core_on_abc


def test_naf_learns_continuous_abc():
    def factory(env):
        size = env.action_space.shape[0]
        return DQNCore(
            model=FCQuadraticStateQFunction(
                n_input_channels=env.observation_space.shape[0],
                n_dim_action=size,
                n_hidden_channels=32,
                n_hidden_layers=1,
                action_space_low=tuple(env.action_space.low.tolist()),
                action_space_high=tuple(env.action_space.high.tolist()),
            ),
            optimizer=optax.adam(3e-3),
            explorer=AdditiveGaussian(0.4, low=-1.0, high=1.0),
            gamma=0.9,
        )

    _, _, returns = train_core_on_abc(
        factory,
        lambda lanes: ReplayBuffer(4096, gamma=0.9, num_lanes=lanes),
        discrete=False,
        size=2,
        steps=800,
        replay_start_size=256,
    )
    assert_optimal(returns)
