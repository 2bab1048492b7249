"""DQN family integration tests (mirrors tests/agents_tests/test_dqn.py)."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.agents import DQN, DQNCore, DoubleDQN, DoubleDQNCore
from pfrl_tpu.envs import ABC, HostJaxEnv
from pfrl_tpu.explorers import ConstantEpsilonGreedy, LinearDecayEpsilonGreedy
from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
from pfrl_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer

from tests.agents_tests.basetest_training import (
    assert_optimal,
    roundtrip_save_load,
    train_core_on_abc,
)


def make_core(core_cls):
    def factory(env):
        model = FCStateQFunctionWithDiscreteAction(
            n_actions=env.action_space.n, n_hidden_channels=32, n_hidden_layers=1
        )
        return core_cls(
            model=model,
            optimizer=optax.adam(1e-2),
            explorer=ConstantEpsilonGreedy(0.3, env.action_space.n),
            gamma=0.9,
        )
    return factory


@pytest.mark.parametrize("core_cls", [DQNCore, DoubleDQNCore])
def test_core_learns_abc(core_cls):
    _, _, returns = train_core_on_abc(
        make_core(core_cls),
        lambda lanes: ReplayBuffer(4096, gamma=0.9, num_lanes=lanes),
        steps=300,
    )
    assert_optimal(returns)


def test_core_learns_abc_with_per():
    _, _, returns = train_core_on_abc(
        make_core(DQNCore),
        lambda lanes: PrioritizedReplayBuffer(
            4096, gamma=0.9, num_lanes=lanes, betasteps=1000
        ),
        steps=300,
    )
    assert_optimal(returns)


def test_core_learns_abc_nstep():
    _, _, returns = train_core_on_abc(
        make_core(DQNCore),
        lambda lanes: ReplayBuffer(4096, num_steps=2, gamma=0.9, num_lanes=lanes),
        steps=300,
        size=3,
    )
    assert_optimal(returns)


def _make_shell_agent(env, **overrides):
    n_actions = env.action_space.n
    model = FCStateQFunctionWithDiscreteAction(
        n_actions=n_actions, n_hidden_channels=32, n_hidden_layers=1
    )
    kwargs = dict(
        replay_start_size=32,
        minibatch_size=16,
        update_interval=1,
        target_update_interval=50,
    )
    kwargs.update(overrides)
    return DQN(
        model,
        optax.adam(1e-2),
        ReplayBuffer(1000, gamma=0.9),
        0.9,
        LinearDecayEpsilonGreedy(1.0, 0.1, 500, n_actions),
        **kwargs,
    )


class TestDQNShell:
    def test_trains_via_host_driver(self, tmp_path):
        from pfrl_tpu.experiments import train_agent_with_evaluation

        env = HostJaxEnv(ABC(size=2, deterministic=True), seed=1)
        agent = _make_shell_agent(env)
        agent, history = train_agent_with_evaluation(
            agent,
            env,
            steps=1500,
            eval_n_steps=None,
            eval_n_episodes=5,
            eval_interval=500,
            outdir=str(tmp_path),
            successful_score=1.0,
            eval_env=HostJaxEnv(ABC(size=2, deterministic=True), seed=2),
        )
        assert history, "no evaluations ran"
        assert history[-1]["eval_score"] == 1.0
        # scores.txt written with the reference's basic columns.
        scores = (tmp_path / "scores.txt").read_text().splitlines()
        assert scores[0].startswith("steps\tepisodes\telapsed\tmean")

    def test_save_load_roundtrip(self):
        env = HostJaxEnv(ABC(size=2, deterministic=True))
        agent = _make_shell_agent(env)
        obs = env.reset()
        for _ in range(40):
            a = agent.act(obs)
            obs2, r, done, info = env.step(a)
            agent.observe(obs2, r, done, info.get("needs_reset", False))
            obs = env.reset() if done else obs2
        roundtrip_save_load(
            agent, lambda: np.stack([env.reset(), env.reset()])
        )
