"""Distribution tests vs closed-form / scipy-free numpy references."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.distributions import (
    Categorical,
    Delta,
    Normal,
    SquashedNormal,
    kl_divergence,
)


class TestCategorical:
    def test_log_prob(self, np_random):
        logits = np_random.randn(5, 4).astype(np.float32)
        d = Categorical(logits=jnp.asarray(logits))
        a = jnp.asarray([0, 1, 2, 3, 0])
        lp = np.asarray(d.log_prob(a))
        ref = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
        np.testing.assert_allclose(lp, ref[np.arange(5), np.asarray(a)], rtol=1e-4)

    def test_entropy_uniform(self):
        d = Categorical(logits=jnp.zeros((2, 8)))
        np.testing.assert_allclose(np.asarray(d.entropy()), math.log(8), rtol=1e-5)

    def test_kl_self_zero(self, np_random):
        logits = jnp.asarray(np_random.randn(3, 5).astype(np.float32))
        d = Categorical(logits=logits)
        np.testing.assert_allclose(np.asarray(d.kl(d)), 0.0, atol=1e-6)

    def test_sample_distribution(self, rng):
        probs = np.array([0.7, 0.2, 0.1], np.float32)
        d = Categorical(logits=jnp.log(jnp.asarray(probs))[None].repeat(20000, 0))
        s = np.asarray(d.sample(rng))
        freq = np.bincount(s, minlength=3) / 20000
        np.testing.assert_allclose(freq, probs, atol=0.02)


class TestNormal:
    def test_log_prob_matches_formula(self, np_random):
        loc = np_random.randn(4, 3).astype(np.float32)
        scale = np.abs(np_random.randn(4, 3)).astype(np.float32) + 0.1
        x = np_random.randn(4, 3).astype(np.float32)
        d = Normal(loc=jnp.asarray(loc), scale=jnp.asarray(scale))
        lp = np.asarray(d.log_prob(jnp.asarray(x)))
        per = (
            -0.5 * ((x - loc) / scale) ** 2
            - np.log(scale)
            - 0.5 * math.log(2 * math.pi)
        )
        np.testing.assert_allclose(lp, per.sum(-1), rtol=1e-4)

    def test_entropy(self):
        d = Normal(loc=jnp.zeros((1, 2)), scale=jnp.ones((1, 2)))
        want = 2 * 0.5 * (1 + math.log(2 * math.pi))
        np.testing.assert_allclose(np.asarray(d.entropy()), want, rtol=1e-5)

    def test_kl(self, np_random):
        p = Normal(loc=jnp.zeros((1, 1)), scale=jnp.ones((1, 1)))
        q = Normal(loc=jnp.ones((1, 1)), scale=jnp.ones((1, 1)) * 2)
        # closed form: log(s2/s1) + (s1^2 + (m1-m2)^2)/(2 s2^2) - 1/2
        want = math.log(2) + (1 + 1) / 8 - 0.5
        np.testing.assert_allclose(np.asarray(kl_divergence(p, q)), want, rtol=1e-5)

    def test_rsample_reparameterized(self, rng):
        d = Normal(loc=jnp.zeros((10000, 1)), scale=jnp.full((10000, 1), 2.0))
        s = np.asarray(d.rsample(rng))
        assert abs(s.std() - 2.0) < 0.1


class TestSquashedNormal:
    def test_samples_in_range(self, rng):
        d = SquashedNormal(loc=jnp.zeros((100, 4)), scale=jnp.full((100, 4), 3.0))
        s = np.asarray(d.sample(rng))
        assert np.all(np.abs(s) <= 1.0)

    def test_sample_and_log_prob_consistent(self, rng):
        d = SquashedNormal(
            loc=jnp.asarray([[0.3, -0.2]]), scale=jnp.asarray([[0.5, 0.8]])
        )
        x, lp = d.sample_and_log_prob(rng)
        lp2 = d.log_prob(x)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-3, atol=1e-4)


class TestDelta:
    def test_sample_is_loc(self, rng):
        d = Delta(loc=jnp.asarray([[1.0, 2.0]]))
        np.testing.assert_array_equal(np.asarray(d.sample(rng)), [[1.0, 2.0]])
        np.testing.assert_array_equal(np.asarray(d.mode()), [[1.0, 2.0]])
