"""C51 / IQN / Rainbow-combo integration tests
(mirrors tests/agents_tests/test_categorical_dqn.py, test_iqn.py)."""

import flax.linen as nn
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.categorical_dqn import (
    CategoricalDQNCore,
    CategoricalDoubleDQNCore,
)
from pfrl_tpu.agents.iqn import IQNCore
from pfrl_tpu.explorers import ConstantEpsilonGreedy
from pfrl_tpu.models import MLP
from pfrl_tpu.models.noisy_linear import FactorizedNoisyDense
from pfrl_tpu.q_functions import (
    DistributionalFCStateQFunctionWithDiscreteAction,
)
from pfrl_tpu.q_functions.quantile_q_functions import ImplicitQuantileQFunction
from pfrl_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer

from tests.agents_tests.basetest_training import assert_optimal, train_core_on_abc


def _c51_factory(core_cls):
    def factory(env):
        model = DistributionalFCStateQFunctionWithDiscreteAction(
            n_actions=env.action_space.n,
            n_atoms=51,
            v_min=-1.0,
            v_max=2.0,
            n_hidden_channels=32,
            n_hidden_layers=1,
        )
        return core_cls(
            model=model,
            optimizer=optax.adam(5e-3),
            explorer=ConstantEpsilonGreedy(0.3, env.action_space.n),
            gamma=0.9,
        )
    return factory


@pytest.mark.parametrize(
    "core_cls", [CategoricalDQNCore, CategoricalDoubleDQNCore]
)
def test_c51_learns_abc(core_cls):
    _, _, returns = train_core_on_abc(
        _c51_factory(core_cls),
        lambda lanes: ReplayBuffer(4096, gamma=0.9, num_lanes=lanes),
        steps=400,
    )
    assert_optimal(returns)


def test_iqn_learns_abc():
    def factory(env):
        model = ImplicitQuantileQFunction(
            psi=MLP(out_size=32, hidden_sizes=(32,)),
            n_actions=env.action_space.n,
        )
        return IQNCore(
            model=model,
            optimizer=optax.adam(5e-3),
            explorer=ConstantEpsilonGreedy(0.3, env.action_space.n),
            gamma=0.9,
            quantile_thresholds_N=8,
            quantile_thresholds_N_prime=8,
            quantile_thresholds_K=8,
        )

    _, _, returns = train_core_on_abc(
        factory,
        lambda lanes: ReplayBuffer(4096, gamma=0.9, num_lanes=lanes),
        steps=400,
    )
    assert_optimal(returns)


class NoisyDistributionalDueling(nn.Module):
    """Rainbow-style head: noisy dense + dueling + C51 atoms."""

    n_actions: int
    n_atoms: int = 31
    v_min: float = -1.0
    v_max: float = 2.0

    @nn.compact
    def __call__(self, x):
        from pfrl_tpu.action_value import DistributionalDiscreteActionValue

        h = nn.relu(FactorizedNoisyDense(32)(x))
        a = FactorizedNoisyDense(self.n_actions * self.n_atoms)(h)
        a = a.reshape(-1, self.n_actions, self.n_atoms)
        v = FactorizedNoisyDense(self.n_atoms)(h)[:, None, :]
        logits = v + a - jnp.mean(a, axis=1, keepdims=True)
        q_dist = jax.nn.softmax(logits, axis=-1)
        z = jnp.linspace(self.v_min, self.v_max, self.n_atoms)
        return DistributionalDiscreteActionValue(q_dist=q_dist, z_values=z)


def test_rainbow_combo_learns_abc():
    """All Rainbow ingredients together: double + distributional + dueling +
    noisy + PER + 2-step returns (reference rainbow reproduction recipe)."""

    def factory(env):
        from pfrl_tpu.explorers import Greedy

        return CategoricalDoubleDQNCore(
            model=NoisyDistributionalDueling(n_actions=env.action_space.n),
            optimizer=optax.adam(5e-3),
            explorer=Greedy(),  # NoisyNet provides the exploration
            gamma=0.9,
        )

    _, _, returns = train_core_on_abc(
        factory,
        lambda lanes: PrioritizedReplayBuffer(
            4096, gamma=0.9, num_steps=2, num_lanes=lanes, betasteps=1000
        ),
        steps=500,
    )
    assert_optimal(returns)
