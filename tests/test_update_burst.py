"""Burst-update mode for the actor-critic host shells.

One jitted lax.scan dispatch for the n updates due at a step, replacing n
host->device round trips — the TPU-native analog of the reference's
ReplayUpdater n_times_update loop (pfrl/replay_buffer.py:290-356).
"""

import flax.linen as nn
import numpy as np
import optax
import pytest

import jax

from pfrl_tpu import spaces
from pfrl_tpu.agents.soft_actor_critic import SoftActorCritic
from pfrl_tpu.envs import HostJaxEnv, Pendulum, SerialVectorEnv, TimeLimit
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import SquashedGaussianHead
from pfrl_tpu.q_functions import FCSAQFunction
from pfrl_tpu.replay import ReplayBuffer


class _Policy(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=2, hidden_sizes=(32,))(x)
        return SquashedGaussianHead(action_size=1)(h)


def _agent(update_burst, seed=0):
    return SoftActorCritic(
        _Policy(),
        FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        optax.adam(1e-3),
        optax.adam(1e-3),
        optax.adam(1e-3),
        ReplayBuffer(4096, gamma=0.99),
        0.99,
        action_space=spaces.box(-1.0, 1.0, (1,)),
        replay_start_size=64,
        minibatch_size=32,
        update_burst=update_burst,
        seed=seed,
    )


def _run(agent, n_vec_steps=20, num_envs=8, seed=0):
    env = SerialVectorEnv(
        [HostJaxEnv(TimeLimit(Pendulum()), seed=seed + i) for i in range(num_envs)]
    )
    obss = env.reset()
    for _ in range(n_vec_steps):
        actions = agent.batch_act(obss)
        obss, rs, dones, infos = env.step(actions)
        resets = np.array([i.get("needs_reset", False) for i in infos])
        agent.batch_observe(obss, rs, dones, resets)
        if np.any(np.asarray(dones) | resets):
            obss = env.reset(~(np.asarray(dones) | resets))
    return agent


def test_burst_runs_and_counts_updates():
    agent = _run(_agent(update_burst=True))
    # 20 vector steps x 8 envs = 160 transitions; updates start at t>=64,
    # 1 update per transition thereafter.
    assert int(agent.train_state.n_updates) == 160 - 64 + 8
    stats = dict(agent.get_statistics())
    assert np.isfinite(stats["average_critic_loss"])


def test_burst_matches_update_count_of_loop():
    a = _run(_agent(update_burst=False), seed=3)
    b = _run(_agent(update_burst=True), seed=3)
    assert int(a.train_state.n_updates) == int(b.train_state.n_updates)


def test_burst_is_deterministic():
    a = _run(_agent(update_burst=True), seed=5)
    b = _run(_agent(update_burst=True), seed=5)
    for x, y in zip(
        jax.tree.leaves(a.train_state.policy_params),
        jax.tree.leaves(b.train_state.policy_params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
