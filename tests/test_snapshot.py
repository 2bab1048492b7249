"""Snapshot/resume tests (reference: DQN.save_snapshot semantics + runner resume)."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from pfrl_tpu.agents import DQN
from pfrl_tpu.agents.snapshot import (
    load_runner_snapshot,
    load_snapshot,
    save_runner_snapshot,
    save_snapshot,
)
from pfrl_tpu.envs import ABC, HostJaxEnv
from pfrl_tpu.explorers import ConstantEpsilonGreedy
from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
from pfrl_tpu.replay import ReplayBuffer


def _agent():
    return DQN(
        FCStateQFunctionWithDiscreteAction(n_actions=2, n_hidden_channels=16, n_hidden_layers=1),
        optax.adam(1e-2),
        ReplayBuffer(256, gamma=0.9),
        0.9,
        ConstantEpsilonGreedy(0.2, 2),
        replay_start_size=16,
        minibatch_size=8,
        target_update_interval=50,
    )


def _run(agent, env, n):
    obs = env.reset()
    for _ in range(n):
        a = agent.act(obs)
        obs2, r, done, info = env.step(a)
        agent.observe(obs2, r, done, info.get("needs_reset", False))
        obs = env.reset() if done else obs2


def test_agent_snapshot_roundtrip(tmp_path):
    env = HostJaxEnv(ABC(size=2, deterministic=True), seed=1)
    agent = _agent()
    _run(agent, env, 60)
    t_before = agent.t
    cursor_before = int(agent.replay_state.cursor)
    save_snapshot(agent, str(tmp_path / "snap"))

    agent2 = _agent()
    _run(agent2, HostJaxEnv(ABC(size=2, deterministic=True), seed=2), 20)
    load_snapshot(agent2, str(tmp_path / "snap"))
    assert agent2.t == t_before
    assert int(agent2.replay_state.cursor) == cursor_before
    p1 = jax.tree.leaves(agent.train_state.params)
    p2 = jax.tree.leaves(agent2.train_state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_runner_snapshot_roundtrip(tmp_path):
    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.experiments.runner import OffPolicyRunner, RunnerConfig

    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(n_actions=2, n_hidden_channels=16, n_hidden_layers=1),
        optimizer=optax.adam(1e-2),
        explorer=ConstantEpsilonGreedy(0.2, 2),
        gamma=0.9,
    )
    cfg = RunnerConfig(
        num_envs=8, replay_start_size=32, update_interval=8,
        target_update_interval=64, minibatch_size=8,
    )
    runner = OffPolicyRunner(
        ABC(size=2, deterministic=True), core,
        ReplayBuffer(512, gamma=0.9, num_lanes=8), cfg,
    )
    state = runner.init(jax.random.PRNGKey(0))
    state, _ = runner.run_chunk(state, 20)
    save_runner_snapshot(state, str(tmp_path / "rsnap"))

    template = runner.init(jax.random.PRNGKey(7))
    restored = load_runner_snapshot(template, str(tmp_path / "rsnap"))
    assert int(restored.t) == int(state.t)
    # Resume training continues seamlessly.
    restored, _ = runner.run_chunk(restored, 5)
    assert int(restored.t) == int(state.t) + 5 * 8
