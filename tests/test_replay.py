"""Replay buffer tests: ring semantics, n-step windows, sum-tree sampling
statistics (mirrors tests/collections_tests + replay_buffers_test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from pfrl_tpu.replay import (
    PrioritizedReplayBuffer,
    ReplayBuffer,
    Transition,
)
from pfrl_tpu.replay import sum_tree


def make_transition(i, lanes=1, obs_dim=3, done=False, terminated=False):
    """Batched transition whose obs encodes its sequence number."""
    i = np.atleast_1d(np.asarray(i))
    return Transition(
        obs=jnp.asarray(
            np.tile(i[:, None], (1, obs_dim)).astype(np.float32)
        ),
        action=jnp.asarray(i % 4, jnp.int32),
        reward=jnp.asarray(i.astype(np.float32)),
        next_obs=jnp.asarray(
            np.tile(i[:, None] + 1, (1, obs_dim)).astype(np.float32)
        ),
        terminated=jnp.asarray(np.broadcast_to(terminated, i.shape)),
        done=jnp.asarray(np.broadcast_to(done or terminated, i.shape)),
        extras=FrozenDict(),
    )


def example_of(tr):
    return jax.tree.map(lambda x: x[0], tr)


class TestUniformReplay:
    def test_add_and_size(self):
        buf = ReplayBuffer(capacity=8, num_lanes=2)
        state = buf.init(example_of(make_transition([0, 0])))
        assert int(state.size) == 0
        for step in range(3):
            state = buf.add(state, make_transition([step, step]))
        assert int(state.size) == 6
        for step in range(10):
            state = buf.add(state, make_transition([step, step]))
        assert int(state.size) == 8  # capacity-capped

    def test_sample_contents_1step(self, rng):
        buf = ReplayBuffer(capacity=16, num_lanes=1)
        state = buf.init(example_of(make_transition([0])))
        for step in range(10):
            state = buf.add(state, make_transition([step]))
        batch = buf.sample(state, rng, 64)
        rewards = np.asarray(batch.reward)
        obs = np.asarray(batch.obs)
        assert rewards.min() >= 0 and rewards.max() <= 9
        # obs encodes the id; reward == id for our fixtures.
        np.testing.assert_allclose(obs[:, 0], rewards)
        np.testing.assert_allclose(np.asarray(batch.discount), buf.gamma)
        assert not np.asarray(batch.is_terminal).any()

    def test_nstep_fold(self, rng):
        gamma = 0.5
        buf = ReplayBuffer(capacity=32, num_steps=3, gamma=gamma, num_lanes=1)
        state = buf.init(example_of(make_transition([0])))
        for step in range(10):
            state = buf.add(state, make_transition([step]))
        # Deterministic gather of id 2: folded = 2 + 0.5*3 + 0.25*4
        batch = buf.gather(state, jnp.asarray([2]))
        np.testing.assert_allclose(
            np.asarray(batch.reward)[0], 2 + 0.5 * 3 + 0.25 * 4
        )
        np.testing.assert_allclose(np.asarray(batch.discount)[0], gamma**3)
        # next_obs is the obs 3 steps ahead (id 5 = next_obs of id 4).
        np.testing.assert_allclose(np.asarray(batch.next_obs)[0, 0], 5.0)

    def test_nstep_cut_at_episode_boundary(self, rng):
        gamma = 0.5
        buf = ReplayBuffer(capacity=32, num_steps=3, gamma=gamma, num_lanes=1)
        state = buf.init(example_of(make_transition([0])))
        for step in range(10):
            # Episode ends (terminated) at step 3.
            state = buf.add(
                state, make_transition([step], terminated=(step == 3))
            )
        batch = buf.gather(state, jnp.asarray([2]))
        # Window 2,3,4 cuts after 3 (terminated): folded = 2 + 0.5*3.
        np.testing.assert_allclose(np.asarray(batch.reward)[0], 2 + 0.5 * 3)
        np.testing.assert_allclose(np.asarray(batch.discount)[0], gamma**2)
        assert bool(np.asarray(batch.is_terminal)[0])
        np.testing.assert_allclose(np.asarray(batch.next_obs)[0, 0], 4.0)

    def test_nstep_multilane_stride(self, rng):
        gamma = 0.5
        buf = ReplayBuffer(capacity=32, num_steps=2, gamma=gamma, num_lanes=2)
        state = buf.init(example_of(make_transition([0, 0])))
        # lane0 gets ids 0,2,4..., lane1 gets 1,3,5... (ids = 10*step + lane)
        for step in range(5):
            state = buf.add(state, make_transition([10 * step, 10 * step + 1]))
        # id at slot 2 (= step1 lane0, value 10): window (10, 20).
        batch = buf.gather(state, jnp.asarray([2]))
        np.testing.assert_allclose(np.asarray(batch.reward)[0], 10 + 0.5 * 20)

    def test_sampleable_range_excludes_incomplete_windows(self, rng):
        buf = ReplayBuffer(capacity=64, num_steps=3, num_lanes=2)
        state = buf.init(example_of(make_transition([0, 0])))
        for step in range(5):
            state = buf.add(state, make_transition([step, step]))
        lo, hi = buf._sampleable_range(state)
        assert int(lo) == 0
        assert int(hi) == 10 - 2 * 2  # newest 2 steps x 2 lanes held out
        ids = buf.sample_indices(state, rng, 256)
        assert int(jnp.max(ids)) < int(hi)


class TestSumTree:
    def test_update_and_total(self):
        tree = sum_tree.init_tree(8)
        tree = sum_tree.update(tree, jnp.asarray([0, 3, 7]), jnp.asarray([1.0, 2.0, 3.0]))
        assert float(sum_tree.total(tree)) == 6.0
        np.testing.assert_allclose(
            np.asarray(sum_tree.get(tree, jnp.asarray([0, 3, 7, 2]))),
            [1.0, 2.0, 3.0, 0.0],
        )

    def test_duplicate_updates(self):
        tree = sum_tree.init_tree(8)
        tree = sum_tree.update(tree, jnp.asarray([2, 2, 2]), jnp.asarray([1.0, 5.0, 3.0]))
        # Parents must be consistent with whatever leaf value won.
        leaf = float(sum_tree.get(tree, jnp.asarray([2]))[0])
        assert float(sum_tree.total(tree)) == leaf

    def test_prefix_descent(self):
        tree = sum_tree.init_tree(8)
        p = np.array([1, 2, 3, 4, 0, 0, 5, 1], np.float32)
        tree = sum_tree.update(tree, jnp.arange(8), jnp.asarray(p))
        cum = np.concatenate([[0], np.cumsum(p)])
        targets = np.array([0.0, 0.5, 1.0, 5.99, 6.0, 15.9], np.float32)
        leaves = np.asarray(sum_tree.sample_from_prefix(tree, jnp.asarray(targets)))
        for t, leaf in zip(targets, leaves):
            assert cum[leaf] <= t < cum[leaf + 1], (t, leaf)

    def test_sampling_distribution(self, rng):
        tree = sum_tree.init_tree(8)
        p = np.array([1, 0, 0, 4, 0, 0, 0, 5], np.float32)
        tree = sum_tree.update(tree, jnp.arange(8), jnp.asarray(p))
        draws = sum_tree.stratified_sample(tree, rng, 10000)
        counts = np.bincount(np.asarray(draws), minlength=8) / 10000
        np.testing.assert_allclose(counts, p / p.sum(), atol=0.02)

    def test_min_tree(self):
        tree = sum_tree.init_min_tree(8)
        tree = sum_tree.update_min(tree, jnp.asarray([1, 5]), jnp.asarray([4.0, 2.0]))
        assert float(sum_tree.min_value(tree)) == 2.0


class TestPrioritizedReplay:
    def _filled(self, n=12, lanes=1, **kwargs):
        buf = PrioritizedReplayBuffer(capacity=16, num_lanes=lanes, **kwargs)
        state = buf.init(example_of(make_transition([0] * lanes)))
        for step in range(n):
            state = buf.add(state, make_transition([step] * lanes))
        return buf, state

    def test_new_items_get_max_priority(self, rng):
        buf, state = self._filled()
        prios = np.asarray(sum_tree.get(state.tree, jnp.arange(12)))
        np.testing.assert_allclose(prios, 1.0)

    def test_sample_and_weights(self, rng):
        buf, state = self._filled()
        batch, state = buf.sample(state, rng, 8)
        # Uniform priorities -> all weights 1 under batch normalization.
        np.testing.assert_allclose(np.asarray(batch.weight), 1.0, rtol=1e-5)
        # Beta annealed once.
        assert float(state.beta) > buf.beta0

    def test_priority_update_biases_sampling(self, rng):
        buf, state = self._filled()
        # Everything gets a near-zero error except id 5 (errors are clipped
        # to error_max=1, so bias comes from shrinking the others).
        ids = jnp.arange(12)
        errors = jnp.where(ids == 5, 1.0, 0.0)
        state = buf.update_priorities(state, ids, errors)
        draws = []
        for i in range(50):
            batch, state = buf.sample(state, jax.random.fold_in(rng, i), 8)
            draws.append(np.asarray(batch.indices))
        frac5 = (np.concatenate(draws) == 5).mean()
        assert frac5 > 0.2, frac5

    def test_priority_from_errors_matches_reference_formula(self):
        buf = PrioritizedReplayBuffer(
            capacity=16, alpha=0.6, eps=0.01, error_min=0.0, error_max=1.0
        )
        errs = jnp.asarray([0.0, 0.5, 2.0])
        got = np.asarray(buf.priority_from_errors(errs))
        want = (np.clip([0.0, 0.5, 2.0], 0, 1) + 0.01) ** 0.6
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_nstep_holdout(self, rng):
        buf = PrioritizedReplayBuffer(capacity=16, num_steps=3, num_lanes=1)
        state = buf.init(example_of(make_transition([0])))
        for step in range(5):
            state = buf.add(state, make_transition([step]))
        prios = np.asarray(sum_tree.get(state.tree, jnp.arange(5)))
        # Newest 2 slots held out; older have max priority.
        np.testing.assert_allclose(prios[:3], 1.0)
        np.testing.assert_allclose(prios[3:], 0.0)
