"""Agent x mode x env x buffer training matrix.

Port of the reference's cross-product test strategy
(tests/agents_tests/basetest_training.py:35-289 + per-agent test modules):
every pfrl-protocol shell agent trains through the host drivers in
  - serial mode  (train_agent_with_evaluation,  ref basetest :35-95)
  - batch mode   (train_agent_batch_with_evaluation, ref :98-175)
across discrete / continuous ABC variants and uniform / PER buffers where
the reference parametrizes them, each with a save -> load -> resume
round-trip (ref :90-95). Fast mode (a handful of steps, no success
requirement) mirrors the reference's *_fast tests and runs in the default
bucket for a representative subset; the full matrix is marked ``slow``.

The partially-observable (recurrent) axis runs on the device-runner path
(tests/test_episodic_replay.py::TestRecurrentDQN/IQN) — recurrence is a
device-core capability in this framework, by design. Actor-learner mode is
covered by tests/agents_tests/test_actor_learner.py.
"""

import functools

import flax.linen as nn
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu import explorers
from pfrl_tpu.agents import (
    AL,
    A2C,
    DDPG,
    DPP,
    DQN,
    IQN,
    PAL,
    PPO,
    REINFORCE,
    TD3,
    TRPO,
    CategoricalDQN,
    DoubleDQN,
    DoublePAL,
    SoftActorCritic,
)
from pfrl_tpu.envs import ABC, HostJaxEnv, SerialVectorEnv
from pfrl_tpu.experiments import (
    train_agent_batch_with_evaluation,
    train_agent_with_evaluation,
)
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import (
    DeterministicHead,
    GaussianHeadWithStateIndependentCovariance,
    SoftmaxCategoricalHead,
    SquashedGaussianHead,
)
from pfrl_tpu.q_functions import (
    DistributionalFCStateQFunctionWithDiscreteAction,
    FCQuadraticStateQFunction,
    FCSAQFunction,
    FCStateQFunctionWithDiscreteAction,
    ImplicitQuantileQFunction,
)
from pfrl_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer


def make_env(discrete, test, seed=0):
    return HostJaxEnv(
        ABC(size=2, discrete=discrete, deterministic=True), seed=seed
    )


def _buffer(kind):
    if kind == "per":
        return PrioritizedReplayBuffer(1000, betasteps=1000, gamma=0.9)
    return ReplayBuffer(1000, gamma=0.9)


_DQN_KW = dict(
    replay_start_size=32,
    minibatch_size=16,
    update_interval=1,
    target_update_interval=50,
)


def _discrete_q(env):
    return FCStateQFunctionWithDiscreteAction(
        n_actions=env.action_space.n, n_hidden_channels=16, n_hidden_layers=1
    )


def _dqn_like(cls, env, buf):
    return cls(
        _discrete_q(env),
        optax.adam(1e-2),
        buf,
        0.9,
        explorers.ConstantEpsilonGreedy(0.2, env.action_space.n),
        **_DQN_KW,
    )


def _naf(env, buf):
    space = env.action_space
    model = FCQuadraticStateQFunction(
        n_input_channels=env.observation_space.shape[0],
        n_dim_action=space.shape[0],
        n_hidden_channels=16,
        n_hidden_layers=1,
        action_space_low=tuple(map(float, space.low)),
        action_space_high=tuple(map(float, space.high)),
    )
    return DQN(
        model,
        optax.adam(1e-2),
        buf,
        0.9,
        explorers.AdditiveGaussian(0.3, low=-1.0, high=1.0),
        **_DQN_KW,
    )


def _categorical(env, buf):
    model = DistributionalFCStateQFunctionWithDiscreteAction(
        n_actions=env.action_space.n,
        n_atoms=51,
        v_min=-1.0,
        v_max=1.0,
        n_hidden_channels=16,
        n_hidden_layers=1,
    )
    return CategoricalDQN(
        model,
        optax.adam(1e-2),
        buf,
        0.9,
        explorers.ConstantEpsilonGreedy(0.2, env.action_space.n),
        **_DQN_KW,
    )


def _iqn(env, buf):
    model = ImplicitQuantileQFunction(
        psi=MLP(out_size=16, hidden_sizes=(16,)), n_actions=env.action_space.n
    )
    return IQN(
        model,
        optax.adam(1e-2),
        buf,
        0.9,
        explorers.ConstantEpsilonGreedy(0.2, env.action_space.n),
        **_DQN_KW,
    )


class _DetPolicy(nn.Module):
    action_size: int = 2

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=self.action_size, hidden_sizes=(16,))(x)
        return DeterministicHead()(jnp.tanh(h))


class _SacPolicy(nn.Module):
    action_size: int = 2

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=2 * self.action_size, hidden_sizes=(16,))(x)
        return SquashedGaussianHead(action_size=self.action_size)(h)


_AC_KW = dict(replay_start_size=32, minibatch_size=16, update_interval=1)


def _ddpg(env, buf):
    return DDPG(
        _DetPolicy(),
        FCSAQFunction(n_hidden_channels=16, n_hidden_layers=1),
        optax.adam(1e-2),
        optax.adam(1e-2),
        buf,
        0.9,
        explorers.AdditiveGaussian(0.3, low=-1.0, high=1.0),
        action_space=env.action_space,
        **_AC_KW,
    )


def _td3(env, buf):
    return TD3(
        _DetPolicy(),
        FCSAQFunction(n_hidden_channels=16, n_hidden_layers=1),
        FCSAQFunction(n_hidden_channels=16, n_hidden_layers=1),
        optax.adam(1e-2),
        optax.adam(1e-2),
        optax.adam(1e-2),
        buf,
        0.9,
        explorers.AdditiveGaussian(0.3, low=-1.0, high=1.0),
        action_space=env.action_space,
        **_AC_KW,
    )


def _sac(env, buf):
    return SoftActorCritic(
        _SacPolicy(),
        FCSAQFunction(n_hidden_channels=16, n_hidden_layers=1),
        FCSAQFunction(n_hidden_channels=16, n_hidden_layers=1),
        optax.adam(1e-2),
        optax.adam(1e-2),
        optax.adam(1e-2),
        buf,
        0.9,
        action_space=env.action_space,
        **_AC_KW,
    )


class _PiVDiscrete(nn.Module):
    n_actions: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(16)(x))
        dist = SoftmaxCategoricalHead()(nn.Dense(self.n_actions)(h))
        v = nn.Dense(1)(nn.tanh(nn.Dense(16)(x)))
        return dist, v


class _PiVContinuous(nn.Module):
    action_size: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(16)(x))
        dist = GaussianHeadWithStateIndependentCovariance(
            action_size=self.action_size
        )(nn.Dense(self.action_size)(h))
        v = nn.Dense(1)(nn.tanh(nn.Dense(16)(x)))
        return dist, v


class _PiDiscrete(nn.Module):
    n_actions: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(16)(x))
        return SoftmaxCategoricalHead()(nn.Dense(self.n_actions)(h))


class _Vf(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(nn.tanh(nn.Dense(16)(x)))


def _pi_v(env):
    if hasattr(env.action_space, "n"):
        return _PiVDiscrete(n_actions=env.action_space.n)
    return _PiVContinuous(action_size=env.action_space.shape[0])


def _ppo(env, buf):
    del buf
    return PPO(
        _pi_v(env), optax.adam(1e-2), gamma=0.9,
        update_interval=16, minibatch_size=8, epochs=2,
    )


def _trpo(env, buf):
    del buf
    policy = (
        _PiDiscrete(n_actions=env.action_space.n)
        if hasattr(env.action_space, "n")
        else _PiVContinuous(action_size=env.action_space.shape[0])
    )
    if not hasattr(env.action_space, "n"):
        # TRPO wants a bare policy module; reuse the Gaussian head tower.
        class _Pi(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = nn.tanh(nn.Dense(16)(x))
                return GaussianHeadWithStateIndependentCovariance(
                    action_size=env.action_space.shape[0]
                )(nn.Dense(env.action_space.shape[0])(h))

        policy = _Pi()
    return TRPO(
        policy, _Vf(), optax.adam(1e-2), gamma=0.9,
        update_interval=16, vf_batch_size=8,
    )


def _a2c(env, buf):
    del buf
    return A2C(
        _pi_v(env), optax.adam(1e-2), gamma=0.9, num_processes=2, update_steps=4
    )


def _reinforce(env, buf):
    del buf
    return REINFORCE(
        _PiDiscrete(n_actions=env.action_space.n), optax.adam(1e-2),
        gamma=0.9, batchsize=2, max_episode_len=8,
    )


# name -> (factory, discrete?, buffer kinds)
MATRIX = {
    "dqn": (functools.partial(_dqn_like, DQN), True, ("uniform", "per")),
    "double_dqn": (functools.partial(_dqn_like, DoubleDQN), True, ("uniform",)),
    "al": (functools.partial(_dqn_like, AL), True, ("uniform",)),
    "pal": (functools.partial(_dqn_like, PAL), True, ("uniform",)),
    "double_pal": (functools.partial(_dqn_like, DoublePAL), True, ("uniform",)),
    "dpp": (functools.partial(_dqn_like, DPP), True, ("uniform",)),
    "categorical_dqn": (_categorical, True, ("uniform", "per")),
    "iqn": (_iqn, True, ("uniform", "per")),
    "naf": (_naf, False, ("uniform", "per")),
    "ddpg": (_ddpg, False, ("uniform", "per")),
    "td3": (_td3, False, ("uniform",)),
    "sac": (_sac, False, ("uniform", "per")),
    "ppo": (_ppo, True, (None,)),
    "ppo_cont": (_ppo, False, (None,)),
    "trpo": (_trpo, True, (None,)),
    "trpo_cont": (_trpo, False, (None,)),
    "a2c": (_a2c, True, (None,)),
    "reinforce": (_reinforce, True, (None,)),
}

CASES = [
    (name, mode, buf)
    for name, (_, _, bufs) in MATRIX.items()
    for mode in ("serial", "batch")
    for buf in bufs
]

# Default-bucket representatives: one off-policy x PER, one continuous
# actor-critic, one on-policy, in each mode.
FAST_CASES = [
    ("dqn", "serial", "per"),
    ("dqn", "batch", "uniform"),
    ("sac", "serial", "uniform"),
    ("ppo", "batch", None),
]


def _run_case(name, mode, buf_kind, tmp_path, steps=12):
    factory, discrete, _ = MATRIX[name]
    buf = _buffer(buf_kind) if buf_kind else None
    env = make_env(discrete, test=False, seed=1)
    agent = factory(env, buf)

    def train(agent, steps, step_offset=0):
        if mode == "serial":
            return train_agent_with_evaluation(
                agent,
                make_env(discrete, test=False, seed=1),
                steps=steps,
                eval_n_steps=None,
                eval_n_episodes=2,
                eval_interval=6,
                outdir=str(tmp_path),
                eval_env=make_env(discrete, test=True, seed=2),
                step_offset=step_offset,
            )
        return train_agent_batch_with_evaluation(
            agent,
            SerialVectorEnv(
                [make_env(discrete, test=False, seed=10 + i) for i in range(2)]
            ),
            steps=steps,
            eval_n_steps=None,
            eval_n_episodes=2,
            eval_interval=6,
            outdir=str(tmp_path),
            eval_env=SerialVectorEnv(
                [make_env(discrete, test=True, seed=20 + i) for i in range(2)]
            ),
            step_offset=step_offset,
        )

    train(agent, steps)

    # save -> load -> identical greedy actions -> resume (ref :90-95).
    obs = np.stack([make_env(discrete, test=True).reset() for _ in range(2)])
    with agent.eval_mode():
        before = np.asarray(agent.batch_act(obs))
    d = tmp_path / "roundtrip"
    agent.save(str(d))
    agent2 = factory(make_env(discrete, test=False, seed=1), _buffer(buf_kind) if buf_kind else None)
    agent2.load(str(d))
    with agent2.eval_mode():
        after = np.asarray(agent2.batch_act(obs))
    np.testing.assert_array_equal(before, after)

    train(agent2, steps, step_offset=steps)  # resume


@pytest.mark.parametrize("name,mode,buf", FAST_CASES,
                         ids=[f"{n}-{m}-{b}" for n, m, b in FAST_CASES])
def test_matrix_fast(name, mode, buf, tmp_path):
    _run_case(name, mode, buf, tmp_path)


SLOW_CASES = [c for c in CASES if c not in FAST_CASES]


@pytest.mark.slow
@pytest.mark.parametrize("name,mode,buf", SLOW_CASES,
                         ids=[f"{n}-{m}-{b}" for n, m, b in SLOW_CASES])
def test_matrix_full(name, mode, buf, tmp_path):
    _run_case(name, mode, buf, tmp_path)
