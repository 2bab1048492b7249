"""ActionValue struct tests (reference: tests/test_action_value.py).

Exact-value checks for every variant: greedy/max/evaluate consistency,
distribution and quantile reductions, the NAF quadratic form, and pytree
behavior under jit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.action_value import (
    DiscreteActionValue,
    DistributionalDiscreteActionValue,
    QuadraticActionValue,
    QuantileDiscreteActionValue,
    SingleActionValue,
)


class TestDiscreteActionValue:
    def setup_method(self):
        self.q = np.asarray([[1.0, 3.0, 2.0], [5.0, -1.0, 0.0]], np.float32)
        self.av = DiscreteActionValue(q_values=jnp.asarray(self.q))

    def test_greedy_max_evaluate(self):
        np.testing.assert_array_equal(self.av.greedy_actions(), [1, 0])
        np.testing.assert_allclose(self.av.max(), [3.0, 5.0])
        np.testing.assert_allclose(
            self.av.evaluate_actions(jnp.asarray([2, 1])), [2.0, -1.0]
        )
        # max == evaluate(greedy) (reference invariant).
        np.testing.assert_allclose(
            self.av.max(), self.av.evaluate_actions(self.av.greedy_actions())
        )

    def test_n_actions_and_params(self):
        assert self.av.n_actions == 3
        assert len(self.av.params) == 1

    def test_works_under_jit(self):
        @jax.jit
        def f(av):
            return av.max()

        np.testing.assert_allclose(f(self.av), [3.0, 5.0])


class TestDistributionalDiscreteActionValue:
    def setup_method(self, method):
        rng = np.random.RandomState(0)
        logits = rng.randn(4, 3, 11)
        self.dist = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        self.z = np.linspace(-2, 2, 11).astype(np.float32)
        self.av = DistributionalDiscreteActionValue(
            q_dist=jnp.asarray(self.dist, jnp.float32), z_values=jnp.asarray(self.z)
        )

    def test_q_values_are_expectations(self):
        expected = np.einsum("baz,z->ba", self.dist, self.z)
        np.testing.assert_allclose(self.av.q_values, expected, rtol=1e-5)

    def test_greedy_and_max(self):
        expected = np.einsum("baz,z->ba", self.dist, self.z)
        np.testing.assert_array_equal(
            self.av.greedy_actions(), expected.argmax(-1)
        )
        np.testing.assert_allclose(self.av.max(), expected.max(-1), rtol=1e-5)

    def test_max_as_distribution_matches_greedy_row(self):
        greedy = np.asarray(self.av.greedy_actions())
        got = np.asarray(self.av.max_as_distribution())
        for b in range(4):
            np.testing.assert_allclose(got[b], self.dist[b, greedy[b]], rtol=1e-6)

    def test_evaluate_actions_as_distribution(self):
        actions = np.asarray([0, 2, 1, 0])
        got = np.asarray(
            self.av.evaluate_actions_as_distribution(jnp.asarray(actions))
        )
        for b, a in enumerate(actions):
            np.testing.assert_allclose(got[b], self.dist[b, a], rtol=1e-6)


class TestQuantileDiscreteActionValue:
    def setup_method(self):
        rng = np.random.RandomState(1)
        self.quantiles = rng.randn(2, 7, 3).astype(np.float32)
        self.av = QuantileDiscreteActionValue(
            quantiles=jnp.asarray(self.quantiles)
        )

    def test_q_values_mean_over_taus(self):
        np.testing.assert_allclose(
            self.av.q_values, self.quantiles.mean(1), rtol=1e-5
        )

    def test_evaluate_actions_as_quantiles(self):
        actions = np.asarray([2, 0])
        got = np.asarray(
            self.av.evaluate_actions_as_quantiles(jnp.asarray(actions))
        )
        for b, a in enumerate(actions):
            np.testing.assert_allclose(got[b], self.quantiles[b, :, a], rtol=1e-6)


class TestQuadraticActionValue:
    def test_unbounded_max_is_v_at_mu(self):
        mu = jnp.asarray([[0.5, -0.5]])
        mat = jnp.asarray(np.eye(2)[None].astype(np.float32))
        v = jnp.asarray([2.0])
        av = QuadraticActionValue(mu=mu, mat=mat, v=v)
        np.testing.assert_allclose(av.greedy_actions(), mu)
        np.testing.assert_allclose(av.max(), v)
        # Quadratic falloff: Q(mu + d) = v - 0.5 d^T P d.
        a = mu + jnp.asarray([[1.0, 0.0]])
        np.testing.assert_allclose(av.evaluate_actions(a), [1.5])

    def test_bounded_greedy_clips(self):
        mu = jnp.asarray([[2.0, -3.0]])
        mat = jnp.asarray(np.eye(2)[None].astype(np.float32))
        v = jnp.asarray([0.0])
        av = QuadraticActionValue(
            mu=mu,
            mat=mat,
            v=v,
            min_action=jnp.asarray([-1.0, -1.0]),
            max_action=jnp.asarray([1.0, 1.0]),
        )
        np.testing.assert_allclose(av.greedy_actions(), [[1.0, -1.0]])
        # max falls below v because mu is outside the box.
        assert float(av.max()[0]) < 0.0
        np.testing.assert_allclose(
            av.max(), av.evaluate_actions(av.greedy_actions())
        )


class TestSingleActionValue:
    def test_evaluator_and_maximizer(self):
        evaluator = lambda a: -((a - 3.0) ** 2)
        av = SingleActionValue(evaluator, maximizer=lambda: jnp.asarray(3.0))
        np.testing.assert_allclose(av.greedy_actions(), 3.0)
        np.testing.assert_allclose(av.max(), 0.0)
        np.testing.assert_allclose(av.evaluate_actions(jnp.asarray(5.0)), -4.0)

    def test_without_maximizer_raises(self):
        av = SingleActionValue(lambda a: a)
        with pytest.raises(RuntimeError):
            av.greedy_actions()
