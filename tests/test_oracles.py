"""Numeric-oracle unit tests: fast kernels vs slow numpy references.

Port of the reference's exact-value unit tests (VERDICT r1 item 4):
  - C51 categorical projection vs a literal numpy scatter loop
    (ref tests/agents_tests/test_categorical_dqn.py, Algorithm 1 of C51).
  - Quantile Huber loss vs a numpy double loop (ref test_iqn.py).
  - GAE vs a per-env recursive numpy loop (ref pfrl/agents/ppo.py:36-53).
  - compute_value_loss / weighted variants vs closed-form numpy
    (ref tests/agents_tests/test_dqn.py loss checks).
  - PER sampling weights, beta annealing, and the physical-slot ->
    monotonic-id reconstruction across ring wrap-around with n-step folds
    vs a host-side transition-history oracle
    (pfrl_tpu/replay/prioritized.py:168-173 — the wrap-around bug magnet).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.ops.categorical import categorical_projection
from pfrl_tpu.ops.quantile import eltwise_huber_quantile_loss
from pfrl_tpu.ops.returns import gae_advantages
from pfrl_tpu.ops.value_loss import (
    compute_value_loss,
    compute_weighted_value_loss,
)
from pfrl_tpu.replay import PrioritizedReplayBuffer
from pfrl_tpu.replay import sum_tree
from pfrl_tpu.replay.transition import Transition


# ---------------------------------------------------------------------- C51
def _np_categorical_projection(y, y_probs, z):
    """Literal scatter implementation of C51 Algorithm 1."""
    B, n = y.shape
    v_min, v_max = z[0], z[-1]
    dz = z[1] - z[0]
    out = np.zeros((B, n), np.float64)
    for b in range(B):
        for j in range(n):
            yj = min(max(y[b, j], v_min), v_max)
            bj = min(max((yj - v_min) / dz, 0.0), n - 1.0)
            lo, up = int(np.floor(bj)), int(np.ceil(bj))
            # The reference's l==u handling: floor atom gets 1-(bj-l),
            # ceil atom gets (bj-l); for integer bj all mass lands on it.
            out[b, lo] += y_probs[b, j] * (1.0 - (bj - lo))
            out[b, up] += y_probs[b, j] * (bj - lo)
    return out


def test_c51_projection_vs_numpy(np_random):
    z = np.linspace(-2.0, 2.0, 51).astype(np.float32)
    y = np_random.uniform(-3, 3, (7, 51)).astype(np.float32)
    p = np_random.dirichlet(np.ones(51), size=7).astype(np.float32)
    got = np.asarray(categorical_projection(jnp.asarray(y), jnp.asarray(p), jnp.asarray(z)))
    want = _np_categorical_projection(y.astype(np.float64), p, z.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)


def test_c51_projection_integer_bins():
    # Atom values exactly on the support: all mass must stay on that atom.
    z = np.array([0.0, 1.0, 2.0], np.float32)
    y = np.array([[0.0, 1.0, 2.0]], np.float32)
    p = np.array([[0.2, 0.3, 0.5]], np.float32)
    got = np.asarray(categorical_projection(jnp.asarray(y), jnp.asarray(p), jnp.asarray(z)))
    np.testing.assert_allclose(got, p, atol=1e-7)


# --------------------------------------------------------------- quantile
def _np_quantile_huber(y, t, taus):
    B, N = y.shape
    Np = t.shape[1]
    out = np.zeros((B, N, Np))
    for b in range(B):
        for i in range(N):
            for j in range(Np):
                u = y[b, i] - t[b, j]
                huber = 0.5 * u * u if abs(u) <= 1.0 else abs(u) - 0.5
                ind = 1.0 if t[b, j] < y[b, i] else 0.0
                out[b, i, j] = abs(taus[b, i] - ind) * huber
    return out


def test_quantile_huber_vs_numpy(np_random):
    y = np_random.randn(4, 8).astype(np.float32)
    t = np_random.randn(4, 6).astype(np.float32)
    taus = np_random.uniform(0, 1, (4, 8)).astype(np.float32)
    got = np.asarray(
        eltwise_huber_quantile_loss(jnp.asarray(y), jnp.asarray(t), jnp.asarray(taus))
    )
    want = _np_quantile_huber(y, t, taus)
    np.testing.assert_allclose(got, want, atol=1e-6)


# --------------------------------------------------------------------- GAE
def _np_gae(rewards, values, next_values, terminated, done, gamma, lambd):
    T, B = rewards.shape
    advs = np.zeros((T, B))
    for b in range(B):
        carry = 0.0
        for t in reversed(range(T)):
            nonterminal = 0.0 if terminated[t, b] else 1.0
            delta = rewards[t, b] + gamma * nonterminal * next_values[t, b] - values[t, b]
            cont = 0.0 if done[t, b] else 1.0
            carry = delta + gamma * lambd * cont * carry
            advs[t, b] = carry
    return advs


def test_gae_vs_numpy(np_random):
    T, B = 12, 3
    rewards = np_random.randn(T, B).astype(np.float32)
    values = np_random.randn(T, B).astype(np.float32)
    next_values = np_random.randn(T, B).astype(np.float32)
    terminated = np_random.rand(T, B) < 0.15
    done = terminated | (np_random.rand(T, B) < 0.1)
    advs, v_targets = gae_advantages(
        jnp.asarray(rewards),
        jnp.asarray(values),
        jnp.asarray(next_values),
        jnp.asarray(terminated),
        jnp.asarray(done),
        0.99,
        0.95,
    )
    want = _np_gae(rewards, values, next_values, terminated, done, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(advs), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(v_targets), want + values, atol=1e-5
    )


# ------------------------------------------------------------- value loss
def test_value_loss_vs_numpy(np_random):
    y = np_random.randn(16).astype(np.float32) * 2
    t = np_random.randn(16).astype(np.float32)
    d = y - t
    huber = np.where(np.abs(d) <= 1, 0.5 * d * d, np.abs(d) - 0.5)
    np.testing.assert_allclose(
        float(compute_value_loss(jnp.asarray(y), jnp.asarray(t))),
        huber.mean(), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(compute_value_loss(jnp.asarray(y), jnp.asarray(t), batch_accumulator="sum")),
        huber.sum(), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(compute_value_loss(jnp.asarray(y), jnp.asarray(t), clip_delta=False)),
        (0.5 * d * d).mean(), rtol=1e-6,
    )
    w = np_random.uniform(0.1, 1.0, 16).astype(np.float32)
    np.testing.assert_allclose(
        float(compute_weighted_value_loss(jnp.asarray(y), jnp.asarray(t), jnp.asarray(w))),
        (huber * w).sum() / 16, rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(
            compute_weighted_value_loss(
                jnp.asarray(y), jnp.asarray(t), jnp.asarray(w), batch_accumulator="sum"
            )
        ),
        (huber * w).sum(), rtol=1e-6,
    )


# ------------------------------------------------- PER wrap-around oracle
def _tr(lane_vals, done):
    lanes = len(lane_vals)
    obs = jnp.asarray(lane_vals, jnp.float32)[:, None]
    return Transition(
        obs=obs,
        action=jnp.zeros((lanes,), jnp.int32),
        reward=jnp.asarray(lane_vals, jnp.float32),
        next_obs=obs + 0.5,
        done=jnp.asarray(done),
        terminated=jnp.asarray(done),
        extras={},
    )


class TestPERWrapAround:
    """Ring wrap-around + n-step + PER combined (VERDICT r1 weak #5)."""

    lanes = 4
    capacity = 64
    num_steps = 2
    gamma = 0.9

    def _fill(self, n_adds):
        buf = PrioritizedReplayBuffer(
            self.capacity,
            num_steps=self.num_steps,
            gamma=self.gamma,
            num_lanes=self.lanes,
            betasteps=100,
        )
        state = buf.init(
            Transition(
                obs=jnp.zeros((1,)),
                action=jnp.zeros((), jnp.int32),
                reward=jnp.zeros(()),
                next_obs=jnp.zeros((1,)),
                done=jnp.zeros((), bool),
                terminated=jnp.zeros((), bool),
                extras={},
            )
        )
        history = []  # monotonic id -> (value, done)
        rng = np.random.RandomState(0)
        for i in range(n_adds):
            vals = [i * 10.0 + k for k in range(self.lanes)]
            dones = [bool(rng.rand() < 0.2) for _ in range(self.lanes)]
            state = buf.add(state, _tr(vals, dones))
            history.extend(zip(vals, dones))
        return buf, state, history

    def test_slot_to_monotonic_id_and_nstep_fold(self, rng):
        # 40 adds x 4 lanes = 160 >> capacity 64: the ring wraps twice.
        buf, state, history = self._fill(40)
        cursor = int(state.cursor)
        assert cursor == 160

        batch, new_state = buf.sample(state, rng, 32)
        slots = np.asarray(batch.indices)
        lo = cursor - self.capacity
        for b, slot in enumerate(slots):
            # Oracle reconstruction: the monotonic id currently stored in
            # this physical slot is the largest live id congruent to it.
            cands = [i for i in range(lo, cursor) if i % self.capacity == slot]
            assert len(cands) == 1
            mono = cands[0]
            val, _ = history[mono]
            np.testing.assert_allclose(float(batch.obs[b, 0]), val)
            # n-step fold along the same lane, stopping at done.
            expected_r, discount = 0.0, 1.0
            last = mono
            for k in range(self.num_steps):
                v, d = history[mono + k * self.lanes]
                expected_r += discount * v
                discount *= self.gamma
                last = mono + k * self.lanes
                if d:
                    break
            np.testing.assert_allclose(
                float(batch.reward[b]), expected_r, rtol=1e-6
            )
            np.testing.assert_allclose(
                float(batch.next_obs[b, 0]), history[last][0] + 0.5, rtol=1e-6
            )

    def test_weights_and_beta_annealing(self, rng):
        buf, state, _ = self._fill(40)
        leaves = np.asarray(state.tree[buf.tree_capacity :])
        beta0 = float(state.beta)
        batch, state = buf.sample(state, rng, 16)
        slots = np.asarray(batch.indices)
        probs = leaves[slots] / leaves.sum()
        want = (probs / probs.min()) ** -beta0
        np.testing.assert_allclose(np.asarray(batch.weight), want, rtol=1e-4)
        # Beta anneals by (1-beta0)/betasteps per sample() call.
        assert float(state.beta) == pytest.approx(beta0 + (1.0 - 0.4) / 100)

    def test_priority_feedback_transform(self, rng):
        """Errors -> priorities: clip to [error_min, error_max], add the
        eps revisit floor, raise to alpha (ref prioritized.py:9-66).
        Priorities never reach zero — the eps floor guarantees revisits."""
        buf, state, _ = self._fill(40)
        slots = np.array([3, 7, 11, 20], np.int32)
        errors = np.array([-0.5, 0.0, 0.4, 3.0], np.float32)
        state = buf.update_priorities(state, jnp.asarray(slots), jnp.asarray(errors))
        got = np.asarray(sum_tree.get(state.tree, jnp.asarray(slots)))
        clipped = np.clip(errors, buf.error_min, buf.error_max)
        want = (clipped + buf.eps) ** buf.alpha
        np.testing.assert_allclose(got, want, rtol=1e-5)
        assert want.min() > 0  # the floor keeps everything sampleable
        assert float(state.max_priority) == pytest.approx(
            max(1.0, want.max())
        )
        # And the tree root equals the sum of all leaves after the update.
        leaves = np.asarray(state.tree[buf.tree_capacity :])
        np.testing.assert_allclose(
            float(sum_tree.total(state.tree)), leaves.sum(), rtol=1e-5
        )


def test_sum_tree_sampling_statistics(rng):
    """Sampling frequencies track priorities (ref test_prioritized.py)."""
    cap = 64
    tree = sum_tree.init_tree(cap)
    prios = np.zeros(cap, np.float32)
    prios[:10] = np.arange(1, 11, dtype=np.float32)
    tree = sum_tree.update(tree, jnp.arange(cap), jnp.asarray(prios))
    counts = np.zeros(cap)
    draws = 200
    for i in range(draws):
        idx = sum_tree.stratified_sample(tree, jax.random.fold_in(rng, i), 16)
        for j in np.asarray(idx):
            counts[j] += 1
    assert counts[10:].sum() == 0  # zero-priority leaves never sampled
    freq = counts[:10] / counts[:10].sum()
    expect = prios[:10] / prios[:10].sum()
    np.testing.assert_allclose(freq, expect, atol=0.02)
