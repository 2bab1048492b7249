"""Optimization-utility tests (reference: tests/utils_tests/
test_conjugate_gradient.py, test_copy_param.py, test_random.py,
test_clip_l2_grad_norm.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.utils.clip_l2_grad_norm import clip_l2_grad_norm
from pfrl_tpu.utils.conjugate_gradient import conjugate_gradient
from pfrl_tpu.utils.copy_param import (
    copy_param,
    soft_copy_param,
    synchronize_parameters,
)
from pfrl_tpu.utils.random import sample_n_k, sample_with_replacement


class TestConjugateGradient:
    def test_solves_spd_system(self, np_random):
        n = 8
        m = np_random.randn(n, n)
        a = m @ m.T + n * np.eye(n)  # SPD, well-conditioned
        b = np_random.randn(n)
        a_j = jnp.asarray(a, jnp.float32)
        x = conjugate_gradient(
            lambda v: a_j @ v, jnp.asarray(b, jnp.float32), max_iter=n * 2
        )
        np.testing.assert_allclose(a @ np.asarray(x), b, atol=1e-3)

    def test_identity_solves_in_one_iter(self):
        b = jnp.asarray([1.0, -2.0, 3.0])
        x = conjugate_gradient(lambda v: v, b, max_iter=1)
        np.testing.assert_allclose(x, b, rtol=1e-6)

    def test_jittable(self, np_random):
        a = jnp.eye(4) * 2.0
        solve = jax.jit(
            lambda b: conjugate_gradient(lambda v: a @ v, b, max_iter=8)
        )
        b = jnp.asarray(np_random.randn(4), jnp.float32)
        np.testing.assert_allclose(solve(b), np.asarray(b) / 2.0, atol=1e-5)


class TestCopyParam:
    def test_hard_copy(self):
        src = {"w": jnp.asarray([1.0, 2.0])}
        dst = copy_param(src)
        np.testing.assert_allclose(dst["w"], src["w"])

    def test_soft_copy_polyak(self):
        target = {"w": jnp.asarray([0.0, 10.0])}
        source = {"w": jnp.asarray([10.0, 0.0])}
        out = soft_copy_param(target, source, tau=0.1)
        np.testing.assert_allclose(out["w"], [1.0, 9.0], rtol=1e-6)

    def test_synchronize_dispatch(self):
        target = {"w": jnp.zeros(2)}
        source = {"w": jnp.ones(2)}
        hard = synchronize_parameters(source, target, method="hard")
        np.testing.assert_allclose(hard["w"], [1.0, 1.0])
        soft = synchronize_parameters(source, target, method="soft", tau=0.5)
        np.testing.assert_allclose(soft["w"], [0.5, 0.5])
        with pytest.raises(ValueError):
            synchronize_parameters(source, target, method="nope")


class TestSampleNK:
    """Statistical checks mirroring the reference's test_random.py: each
    element appears with probability k/n; samples are distinct."""

    def test_distinct_and_in_range(self, rng):
        idx = np.asarray(sample_n_k(rng, 10, 10))
        assert sorted(idx.tolist()) == list(range(10))

    def test_rejects_k_greater_than_n(self, rng):
        with pytest.raises(ValueError):
            sample_n_k(rng, 3, 4)

    def test_marginal_uniformity(self, rng):
        n, k, trials = 12, 4, 800
        counts = np.zeros(n)
        keys = jax.random.split(rng, trials)
        batch = jax.vmap(lambda key: sample_n_k(key, n, k))(keys)
        batch = np.asarray(batch)
        for row in batch:
            assert len(set(row.tolist())) == k
            counts[row] += 1
        # Each index should appear ~ trials*k/n times (tolerance 5 sigma).
        expected = trials * k / n
        sigma = np.sqrt(trials * (k / n) * (1 - k / n))
        assert np.all(np.abs(counts - expected) < 5 * sigma), counts

    def test_with_replacement_range(self, rng):
        idx = np.asarray(sample_with_replacement(rng, 5, 100))
        assert idx.min() >= 0 and idx.max() < 5


class TestClipL2GradNorm:
    def test_noop_under_max(self):
        g = {"a": jnp.asarray([3.0, 4.0])}  # norm 5
        out = clip_l2_grad_norm(g, max_norm=10.0)
        np.testing.assert_allclose(out["a"], g["a"], rtol=1e-5)

    def test_scales_down_to_max(self):
        g = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.0])}
        out = clip_l2_grad_norm(g, max_norm=1.0)
        total = np.sqrt(sum(float(jnp.sum(v * v)) for v in out.values()))
        np.testing.assert_allclose(total, 1.0, rtol=1e-4)
        # Direction preserved.
        np.testing.assert_allclose(
            np.asarray(out["a"]) / np.linalg.norm(out["a"]),
            np.asarray([0.6, 0.8]),
            rtol=1e-4,
        )
