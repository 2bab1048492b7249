"""Episodic replay buffer + recurrent DQN tests."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from pfrl_tpu.replay.episodic import EpisodicReplayBuffer
from pfrl_tpu.replay.transition import Transition


def step_batch(values, dones):
    values = np.asarray(values, np.float32)
    dones = np.asarray(dones, bool)
    b = len(values)
    return Transition(
        obs=jnp.asarray(values[:, None]),
        action=jnp.zeros((b,), jnp.int32),
        reward=jnp.asarray(values),
        next_obs=jnp.asarray(values[:, None] + 0.5),
        terminated=jnp.asarray(dones),
        done=jnp.asarray(dones),
        extras=FrozenDict(),
    )


class TestEpisodicReplay:
    def test_episode_routing_and_lengths(self):
        buf = EpisodicReplayBuffer(max_episodes=8, max_episode_len=5, num_lanes=2)
        state = buf.init(jax.tree.map(lambda x: x[0], step_batch([0, 0], [0, 0])))
        # Lane 0: episode of length 3; lane 1: two episodes of lengths 1, 2.
        state = buf.add(state, step_batch([1, 10], [False, True]))
        state = buf.add(state, step_batch([2, 20], [False, False]))
        state = buf.add(state, step_batch([3, 21], [True, True]))
        assert int(state.n_finished) == 3
        finished_rows = np.where(np.asarray(state.finished))[0]
        lens = np.asarray(state.ep_len)[finished_rows]
        assert sorted(lens.tolist()) == [1, 2, 3]

    def test_sampled_episode_contents(self, rng):
        buf = EpisodicReplayBuffer(max_episodes=8, max_episode_len=5, num_lanes=1)
        state = buf.init(jax.tree.map(lambda x: x[0], step_batch([0], [0])))
        for v in [1, 2, 3]:
            state = buf.add(state, step_batch([v], [v == 3]))
        batch = buf.sample_episodes(state, rng, 4)
        rewards = np.asarray(batch.transitions.reward)
        mask = np.asarray(batch.mask)
        for b in range(4):
            assert int(batch.lengths[b]) == 3
            np.testing.assert_allclose(rewards[b][: 3], [1, 2, 3])
            np.testing.assert_allclose(mask[b], [1, 1, 1, 0, 0])

    def test_long_episode_truncated(self):
        buf = EpisodicReplayBuffer(max_episodes=8, max_episode_len=3, num_lanes=1)
        state = buf.init(jax.tree.map(lambda x: x[0], step_batch([0], [0])))
        for v in range(1, 6):
            state = buf.add(state, step_batch([v], [v == 5]))
        row = int(np.asarray(state.finished).argmax())
        assert int(state.ep_len[row]) == 3  # first 3 steps kept
        np.testing.assert_allclose(
            np.asarray(state.storage.reward)[row], [1, 2, 3]
        )


class TestRecurrentDQN:
    def test_learns_po_abc(self):
        """DRQN solves the partially-observable ABC chain — requires memory
        of the episode's observation offset (reference test_dqn recurrent
        parametrization)."""
        import flax.linen as nn

        from pfrl_tpu.agents.recurrent_dqn import RecurrentDQNCore
        from pfrl_tpu.envs import ABC
        from pfrl_tpu.experiments.runner import (
            JaxEvalLoop,
            OffPolicyRunner,
            RunnerConfig,
        )
        from pfrl_tpu.explorers import ConstantEpsilonGreedy
        from pfrl_tpu.action_value import DiscreteActionValue
        from pfrl_tpu.models.recurrent import LSTMCellModule

        class RQ(nn.Module):
            n_actions: int = 2

            @nn.compact
            def __call__(self, x, carry):
                h = nn.relu(nn.Dense(32)(x))
                h, new_carry = LSTMCellModule(32)(h, carry[0])
                q = nn.Dense(self.n_actions)(h)
                return DiscreteActionValue(q_values=q), (new_carry,)

            def initial_carry(self, batch_size):
                return (
                    (
                        jnp.zeros((batch_size, 32), jnp.float32),
                        jnp.zeros((batch_size, 32), jnp.float32),
                    ),
                )

        env = ABC(size=2, partially_observable=True, deterministic=True)
        core = RecurrentDQNCore(
            model=RQ(),
            optimizer=optax.adam(5e-3),
            explorer=ConstantEpsilonGreedy(0.3, 2),
            gamma=0.9,
        )
        from pfrl_tpu.replay.episodic import EpisodicReplayBuffer

        cfg = RunnerConfig(
            num_envs=16,
            replay_start_size=128,
            update_interval=16,
            target_update_interval=128,
            minibatch_size=16,
        )
        buffer = EpisodicReplayBuffer(
            max_episodes=512, max_episode_len=4, num_lanes=16
        )
        runner = OffPolicyRunner(env, core, buffer, cfg)
        state = runner.init(jax.random.PRNGKey(0))
        state, _ = runner.run_chunk(state, 600)

        evaluator = JaxEvalLoop(env, core, num_episodes=8, max_steps=4)
        returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
        assert np.all(returns >= 1.0), returns


class TestRecurrentIQN:
    def test_learns_po_abc(self):
        """Recurrent IQN solves the partially-observable ABC chain
        (reference: pfrl/agents/iqn.py:127-173 recurrent model + the
        recurrent parametrization of tests/agents_tests/test_iqn.py)."""
        import flax.linen as nn

        from pfrl_tpu.agents import RecurrentIQNCore
        from pfrl_tpu.envs import ABC
        from pfrl_tpu.experiments.runner import (
            JaxEvalLoop,
            OffPolicyRunner,
            RunnerConfig,
        )
        from pfrl_tpu.explorers import ConstantEpsilonGreedy
        from pfrl_tpu.models.recurrent import LSTMCellModule
        from pfrl_tpu.q_functions import RecurrentImplicitQuantileQFunction
        from pfrl_tpu.replay.episodic import EpisodicReplayBuffer

        class Psi(nn.Module):
            @nn.compact
            def __call__(self, x, carry):
                h = nn.relu(nn.Dense(32)(x))
                h, new_carry = LSTMCellModule(32)(h, carry[0])
                return h, (new_carry,)

            def initial_carry(self, batch_size):
                return (
                    (
                        jnp.zeros((batch_size, 32), jnp.float32),
                        jnp.zeros((batch_size, 32), jnp.float32),
                    ),
                )

        env = ABC(size=2, partially_observable=True, deterministic=True)
        core = RecurrentIQNCore(
            model=RecurrentImplicitQuantileQFunction(
                psi=Psi(), n_actions=2, n_basis_functions=32
            ),
            optimizer=optax.adam(5e-3),
            explorer=ConstantEpsilonGreedy(0.3, 2),
            gamma=0.9,
            quantile_thresholds_N=8,
            quantile_thresholds_N_prime=8,
            quantile_thresholds_K=8,
        )
        cfg = RunnerConfig(
            num_envs=16,
            replay_start_size=128,
            update_interval=16,
            target_update_interval=128,
            minibatch_size=16,
        )
        buffer = EpisodicReplayBuffer(
            max_episodes=512, max_episode_len=4, num_lanes=16
        )
        runner = OffPolicyRunner(env, core, buffer, cfg)
        state = runner.init(jax.random.PRNGKey(0))
        state, _ = runner.run_chunk(state, 600)

        evaluator = JaxEvalLoop(env, core, num_episodes=8, max_steps=4)
        returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
        assert np.all(returns >= 1.0), returns
