"""Shared agent integration-test machinery.

Mirrors the reference's _TestTraining pattern
(tests/agents_tests/basetest_training.py:35-175): train on the
deterministic ABC chain env and require the optimal policy; fast variants
run a few steps plus a save->load->resume round-trip.

Two harnesses:
- runner-based (on-device scan loop) for functional cores;
- shell-based (host batch driver) for the pfrl-protocol agents.
"""

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from pfrl_tpu.envs import ABC
from pfrl_tpu.experiments.runner import (
    JaxEvalLoop,
    OffPolicyRunner,
    RunnerConfig,
)


def train_core_on_abc(
    core_factory,
    buffer_factory,
    *,
    discrete=True,
    size=2,
    num_envs=16,
    steps=400,
    replay_start_size=64,
    minibatch_size=32,
    target_update_interval=64,
    seed=0,
):
    """Train a functional core on ABC via the on-device runner.

    ``core_factory(env)`` -> agent core; ``buffer_factory(num_lanes)`` ->
    replay buffer. Returns (runner, final_state, eval_returns).
    """
    env = ABC(size=size, discrete=discrete, episodic=True, deterministic=True)
    core = core_factory(env)
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=replay_start_size,
        update_interval=num_envs,  # one update per scan step
        target_update_interval=target_update_interval,
        minibatch_size=minibatch_size,
    )
    buffer = buffer_factory(num_envs)
    runner = OffPolicyRunner(env, core, buffer, cfg)
    state = runner.init(jax.random.PRNGKey(seed))
    state, _ = runner.run_chunk(state, steps)

    evaluator = JaxEvalLoop(env, core, num_episodes=5, max_steps=size + 2)
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(seed + 1))
    return runner, state, returns


def assert_optimal(returns, threshold=1.0):
    """The reference requires 5/5 evaluation successes (R == 1 on ABC)."""
    assert np.all(returns >= threshold), f"eval returns {returns}"


def roundtrip_save_load(agent, make_obs):
    """Save -> load -> same actions (reference basetest_training.py:90-95)."""
    obs = make_obs()
    with agent.eval_mode():
        a_before = agent.batch_act(obs)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "agent")
        agent.save(path)
        agent.load(path)
    with agent.eval_mode():
        a_after = agent.batch_act(obs)
    np.testing.assert_array_equal(np.asarray(a_before), np.asarray(a_after))
