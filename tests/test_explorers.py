"""Explorer tests (mirrors tests/explorers_tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.action_value import DiscreteActionValue
from pfrl_tpu.explorers import (
    AdditiveGaussian,
    AdditiveOU,
    Boltzmann,
    ConstantEpsilonGreedy,
    ExponentialDecayEpsilonGreedy,
    Greedy,
    LinearDecayEpsilonGreedy,
)


class TestEpsilonGreedy:
    def test_linear_decay_schedule(self):
        ex = LinearDecayEpsilonGreedy(1.0, 0.1, 100, 4)
        assert float(ex.epsilon_at(jnp.asarray(0))) == pytest.approx(1.0)
        assert float(ex.epsilon_at(jnp.asarray(50))) == pytest.approx(0.55)
        assert float(ex.epsilon_at(jnp.asarray(100))) == pytest.approx(0.1)
        assert float(ex.epsilon_at(jnp.asarray(1000))) == pytest.approx(0.1)

    def test_exponential_decay_schedule(self):
        ex = ExponentialDecayEpsilonGreedy(0.9, 0.1, 0.99, 4)
        assert float(ex.epsilon_at(jnp.asarray(0))) == pytest.approx(0.9)
        assert float(ex.epsilon_at(jnp.asarray(10))) == pytest.approx(0.9 * 0.99**10)
        assert float(ex.epsilon_at(jnp.asarray(10**6))) == pytest.approx(0.1)

    def test_random_fraction(self, rng):
        ex = ConstantEpsilonGreedy(0.5, 10)
        greedy = jnp.zeros((10000,), jnp.int32)
        a = np.asarray(ex.select_action(rng, jnp.asarray(0), greedy))
        frac_nongreedy = (a != 0).mean()
        # eps=0.5, 10 actions: P(non-greedy) = 0.5 * 9/10 = 0.45
        assert abs(frac_nongreedy - 0.45) < 0.03

    def test_greedy_when_epsilon_zero(self, rng):
        ex = ConstantEpsilonGreedy(0.0, 4)
        greedy = jnp.asarray([1, 2, 3], jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(ex.select_action(rng, jnp.asarray(0), greedy)), [1, 2, 3]
        )


class TestBoltzmann:
    def test_prefers_high_q(self, rng):
        ex = Boltzmann(T=0.1)
        q = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (5000, 1)).astype(np.float32))
        av = DiscreteActionValue(q_values=q)
        a = np.asarray(ex.select_action(rng, jnp.asarray(0), av.greedy_actions(), av))
        assert (a == 1).mean() > 0.95


class TestAdditive:
    def test_gaussian_clip(self, rng):
        ex = AdditiveGaussian(1.0, low=-0.5, high=0.5)
        greedy = jnp.zeros((1000, 2))
        a = np.asarray(ex.select_action(rng, jnp.asarray(0), greedy))
        assert np.all(np.abs(a) <= 0.5)
        assert a.std() > 0.1

    def test_ou_stateful_correlation(self, rng):
        ex = AdditiveOU(theta=0.15, sigma=0.3)
        state = ex.init_state((1, 2))
        greedy = jnp.zeros((1, 2))
        prev = None
        deltas = []
        for i in range(50):
            a, state = ex.select_action_stateful(
                jax.random.fold_in(rng, i), state, greedy
            )
            if prev is not None:
                deltas.append(np.abs(np.asarray(a - prev)).mean())
            prev = a
        # OU noise is temporally correlated: successive deltas are much
        # smaller than the running magnitude.
        assert np.mean(deltas) < np.abs(np.asarray(prev)).mean() + 1.0


class TestGreedy:
    def test_passthrough(self, rng):
        ex = Greedy()
        g = jnp.asarray([3, 1])
        np.testing.assert_array_equal(
            np.asarray(ex.select_action(rng, jnp.asarray(0), g)), [3, 1]
        )
