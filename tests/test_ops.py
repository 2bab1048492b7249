"""Exact-value unit tests for the core RL kernels vs numpy references.

Mirrors the reference's loss/operator unit-test strategy (SURVEY.md §4.2):
each op is pinned against an independent, loop-based numpy implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu import ops


class TestValueLoss:
    def test_huber(self):
        x = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
        expected = np.array([2.5, 0.125, 0.0, 0.125, 2.5])
        np.testing.assert_allclose(ops.huber_loss(x), expected, rtol=1e-6)

    @pytest.mark.parametrize("acc", ["mean", "sum"])
    @pytest.mark.parametrize("clip", [True, False])
    def test_compute_value_loss(self, acc, clip, np_random):
        y = np_random.randn(16).astype(np.float32)
        t = np_random.randn(16).astype(np.float32)
        got = ops.compute_value_loss(
            jnp.asarray(y), jnp.asarray(t), clip_delta=clip, batch_accumulator=acc
        )
        d = y - t
        per = np.where(np.abs(d) <= 1, 0.5 * d**2, np.abs(d) - 0.5) if clip else 0.5 * d**2
        want = per.sum() if acc == "sum" else per.mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_weighted_matches_uniform_weights(self, np_random):
        y = np_random.randn(8).astype(np.float32)
        t = np_random.randn(8).astype(np.float32)
        w = np.ones(8, np.float32)
        a = ops.compute_value_loss(jnp.asarray(y), jnp.asarray(t))
        b = ops.compute_weighted_value_loss(
            jnp.asarray(y), jnp.asarray(t), jnp.asarray(w)
        )
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestNStepFold:
    @pytest.mark.parametrize("n", [1, 3, 5])
    def test_matches_loop(self, n, np_random):
        gamma = 0.9
        B = 32
        rewards = np_random.randn(B, n).astype(np.float32)
        terminals = np_random.rand(B, n) < 0.2
        folded, disc, term = ops.n_step_returns_from_window(
            jnp.asarray(rewards), jnp.asarray(terminals), gamma
        )
        for b in range(B):
            r, k, is_t = 0.0, 0, False
            for i in range(n):
                r += gamma**i * rewards[b, i]
                k += 1
                if terminals[b, i]:
                    is_t = True
                    break
            np.testing.assert_allclose(folded[b], r, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(disc[b], gamma**k, rtol=1e-4)
            assert bool(term[b]) == is_t


class TestGAE:
    def test_matches_reference_loop(self, np_random):
        """Pin against a direct port of the reference's per-episode GAE
        (pfrl/agents/ppo.py:36-53)."""
        T, B = 40, 3
        gamma, lambd = 0.99, 0.95
        rewards = np_random.randn(T, B).astype(np.float32)
        values = np_random.randn(T, B).astype(np.float32)
        next_values = np_random.randn(T, B).astype(np.float32)
        # Random episode boundaries; last step of each lane not forced done.
        terminated = np_random.rand(T, B) < 0.1
        truncated = (np_random.rand(T, B) < 0.1) & ~terminated
        done = terminated | truncated

        adv, vt = ops.gae_advantages(
            jnp.asarray(rewards),
            jnp.asarray(values),
            jnp.asarray(next_values),
            jnp.asarray(terminated),
            jnp.asarray(done),
            gamma,
            lambd,
        )

        want = np.zeros((T, B), np.float32)
        for b in range(B):
            running = 0.0
            for t in reversed(range(T)):
                nonterminal = 0.0 if terminated[t, b] else 1.0
                delta = rewards[t, b] + gamma * nonterminal * next_values[t, b] - values[t, b]
                if done[t, b]:
                    running = 0.0
                running = delta + gamma * lambd * running
                want[t, b] = running
        np.testing.assert_allclose(adv, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(vt, want + values, rtol=1e-4, atol=1e-5)


class TestCategoricalProjection:
    def _numpy_reference(self, y, y_probs, z):
        """Direct port of the reference scatter-add algorithm
        (pfrl/agents/categorical_dqn.py:7-57)."""
        batch_size, n_atoms = y.shape
        delta_z = z[1] - z[0]
        v_min, v_max = z[0], z[-1]
        y = np.clip(y, v_min, v_max)
        bj = np.clip((y - v_min) / delta_z, 0, n_atoms - 1)
        l, u = np.floor(bj), np.ceil(bj)
        out = np.zeros((batch_size, n_atoms), np.float32)
        for b in range(batch_size):
            for i in range(n_atoms):
                out[b, int(l[b, i])] += y_probs[b, i] * (1 - (bj[b, i] - l[b, i]))
                out[b, int(u[b, i])] += y_probs[b, i] * (bj[b, i] - l[b, i])
        return out

    def test_matches_reference(self, np_random):
        B, n_atoms = 16, 51
        z = np.linspace(-10, 10, n_atoms).astype(np.float32)
        y = (np_random.randn(B, n_atoms) * 8).astype(np.float32)
        p = np_random.rand(B, n_atoms).astype(np.float32)
        p /= p.sum(axis=1, keepdims=True)
        got = ops.categorical_projection(jnp.asarray(y), jnp.asarray(p), jnp.asarray(z))
        want = self._numpy_reference(y, p, z)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got).sum(axis=1), 1.0, rtol=1e-5)

    def test_integer_alignment(self):
        # Atom values exactly on the grid keep their mass in place.
        z = np.linspace(0, 1, 11).astype(np.float32)
        p = np.full((1, 11), 1 / 11, np.float32)
        got = ops.categorical_projection(jnp.asarray(z[None]), jnp.asarray(p), jnp.asarray(z))
        np.testing.assert_allclose(got, p, rtol=1e-5)


class TestQuantile:
    def test_cosine_basis(self):
        x = jnp.array([0.0, 0.5])
        out = ops.cosine_basis_functions(x, 4)
        want = np.cos(np.array([0.0, 0.5])[:, None] * np.pi * np.arange(1, 5))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_quantile_huber_loss_matches_loop(self, np_random):
        B, N, Np = 4, 8, 8
        y = np_random.randn(B, N).astype(np.float32)
        t = np_random.randn(B, Np).astype(np.float32)
        taus = np_random.rand(B, N).astype(np.float32)
        from pfrl_tpu.ops.quantile import eltwise_huber_quantile_loss

        got = eltwise_huber_quantile_loss(
            jnp.asarray(y), jnp.asarray(t), jnp.asarray(taus)
        )
        want = np.zeros((B, N, Np), np.float32)
        for b in range(B):
            for i in range(N):
                for j in range(Np):
                    d = y[b, i] - t[b, j]
                    h = 0.5 * d * d if abs(d) <= 1 else abs(d) - 0.5
                    ind = 1.0 if t[b, j] < y[b, i] else 0.0
                    want[b, i, j] = abs(taus[b, i] - ind) * h
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


class TestDiscountedReturns:
    def test_simple_chain(self):
        rewards = jnp.asarray(np.array([[1.0], [1.0], [1.0]], np.float32))
        terminated = jnp.zeros((3, 1), bool)
        boot = jnp.zeros((1,), jnp.float32)
        g = ops.discounted_returns(rewards, terminated, boot, 0.5)
        np.testing.assert_allclose(np.asarray(g)[:, 0], [1.75, 1.5, 1.0])
