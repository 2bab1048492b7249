"""DDPG / TD3 / SAC integration tests on the continuous ABC env
(mirrors tests/agents_tests/test_ddpg.py etc.)."""

import flax.linen as nn
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.ddpg import DDPGCore
from pfrl_tpu.agents.soft_actor_critic import SACCore
from pfrl_tpu.agents.td3 import TD3Core
from pfrl_tpu.envs import ABC
from pfrl_tpu.explorers import AdditiveGaussian
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import DeterministicHead, SquashedGaussianHead
from pfrl_tpu.q_functions import FCSAQFunction

from tests.agents_tests.basetest_training import assert_optimal, train_core_on_abc


class DetPolicy(nn.Module):
    action_size: int

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=self.action_size, hidden_sizes=(32,))(x)
        return DeterministicHead()(jnp.tanh(h))


class SacPolicy(nn.Module):
    action_size: int

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=2 * self.action_size, hidden_sizes=(32,))(x)
        return SquashedGaussianHead(action_size=self.action_size)(h)


def _uniform_burnin(rng, batch):
    """Reference parity: burnin_action_func in the mujoco reproduction
    scripts samples uniform random actions before learning starts."""
    return jax.random.uniform(rng, (batch, 2), minval=-1.0, maxval=1.0)


_BURNIN_STEPS = 512


def _ddpg_factory(env):
    size = env.action_space.shape[0]
    return DDPGCore(
        policy=DetPolicy(action_size=size),
        q_func=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        policy_optimizer=optax.adam(1e-2),
        q_optimizer=optax.adam(1e-2),
        explorer=AdditiveGaussian(0.3, low=-1.0, high=1.0),
        gamma=0.9,
        burnin_action_func=_uniform_burnin,
        burnin_steps=_BURNIN_STEPS,
    )


def _td3_factory(env):
    # TD3's pessimistic twin-min critic learns slower than DDPG's; a hot
    # actor lr overcommits into tanh saturation before the critic is right
    # (same pathology the reference avoids with its 3e-4 reproduction lr).
    size = env.action_space.shape[0]
    return TD3Core(
        policy=DetPolicy(action_size=size),
        q_func1=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        q_func2=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        policy_optimizer=optax.adam(1e-3),
        q_func1_optimizer=optax.adam(1e-2),
        q_func2_optimizer=optax.adam(1e-2),
        explorer=AdditiveGaussian(0.3, low=-1.0, high=1.0),
        gamma=0.9,
        burnin_action_func=_uniform_burnin,
        burnin_steps=_BURNIN_STEPS,
    )


def _sac_factory(env):
    size = env.action_space.shape[0]
    return SACCore(
        policy=SacPolicy(action_size=size),
        q_func1=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        q_func2=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        policy_optimizer=optax.adam(1e-2),
        q_func1_optimizer=optax.adam(1e-2),
        q_func2_optimizer=optax.adam(1e-2),
        gamma=0.9,
        entropy_target=-float(size),
        burnin_action_func=_uniform_burnin,
        burnin_steps=_BURNIN_STEPS,
    )


@pytest.mark.parametrize(
    "factory,steps",
    [(_ddpg_factory, 500), (_td3_factory, 2000), (_sac_factory, 800)],
    ids=["ddpg", "td3", "sac"],
)
def test_actor_critic_learns_continuous_abc(factory, steps):
    from pfrl_tpu.replay import ReplayBuffer

    _, _, returns = train_core_on_abc(
        factory,
        lambda lanes: ReplayBuffer(4096, gamma=0.9, num_lanes=lanes),
        discrete=False,
        size=2,
        steps=steps,
        # Updates start when burn-in ends, like the reference reproduction
        # scripts (replay_start_size == burn-in length): the actor must not
        # chase an untrained critic into tanh saturation.
        replay_start_size=_BURNIN_STEPS,
    )
    assert_optimal(returns)
