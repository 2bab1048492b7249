"""Model substrate tests (mirrors tests/nn_tests)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu.models import (
    MLP,
    Branched,
    EmpiricalNormalization,
    FactorizedNoisyDense,
    LargeAtariCNN,
    SmallAtariCNN,
)
from pfrl_tpu.models.recurrent import (
    GRUCellModule,
    LSTMCellModule,
    RecurrentSequential,
)
from pfrl_tpu.utils.recurrent import unroll


class TestAtariCNN:
    @pytest.mark.parametrize("cls,out", [(LargeAtariCNN, 512), (SmallAtariCNN, 256)])
    def test_output_shape(self, cls, out, rng):
        model = cls()
        x = jnp.zeros((3, 84, 84, 4))
        params = model.init(rng, x)
        y = model.apply(params, x)
        assert y.shape == (3, out)
        assert bool(jnp.all(y >= 0))  # relu output


class TestNoisyDense:
    def test_noise_changes_output(self, rng):
        model = FactorizedNoisyDense(8)
        x = jnp.ones((2, 4))
        params = model.init({"params": rng, "noise": rng}, x)
        y1 = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
        y2 = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_deterministic_mode(self, rng):
        model = FactorizedNoisyDense(8)
        x = jnp.ones((2, 4))
        params = model.init({"params": rng, "noise": rng}, x)
        y1 = model.apply(params, x, True, rngs={"noise": jax.random.PRNGKey(1)})
        y2 = model.apply(params, x, True, rngs={"noise": jax.random.PRNGKey(2)})
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_noise_scale_reasonable(self, rng):
        """Mean output magnitude should be moderate (reference
        tests/nn_tests/test_noisy_linear.py checks |y| < 100)."""
        model = FactorizedNoisyDense(64)
        x = jnp.ones((16, 32))
        params = model.init({"params": rng, "noise": rng}, x)
        y = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(3)})
        assert float(jnp.abs(y).mean()) < 10.0


class TestEmpiricalNormalization:
    def test_converges_to_true_stats(self, np_random):
        norm = EmpiricalNormalization((3,))
        state = norm.init()
        data = (np_random.randn(1000, 3) * np.array([1.0, 2.0, 0.5]) + 7.0).astype(
            np.float32
        )
        for i in range(0, 1000, 100):
            state = norm.update(state, jnp.asarray(data[i : i + 100]))
        np.testing.assert_allclose(np.asarray(state.mean), data.mean(0), rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(jnp.sqrt(state.var)), data.std(0), rtol=1e-2
        )
        out = norm.normalize(state, jnp.asarray(data))
        assert abs(float(out.mean())) < 0.1
        back = norm.inverse(state, out)
        np.testing.assert_allclose(np.asarray(back), data, rtol=1e-2, atol=1e-3)

    def test_until_freezes(self, np_random):
        norm = EmpiricalNormalization((2,), until=50)
        state = norm.init()
        state = norm.update(state, jnp.asarray(np_random.randn(50, 2).astype(np.float32)))
        frozen_mean = np.asarray(state.mean).copy()
        state = norm.update(
            state, jnp.asarray((np_random.randn(100, 2) + 100).astype(np.float32))
        )
        np.testing.assert_array_equal(np.asarray(state.mean), frozen_mean)


class TestRecurrent:
    def test_unroll_with_resets(self, rng):
        model = RecurrentSequential(
            layers=(nn.Dense(8), nn.relu, LSTMCellModule(8))
        )
        carry = model.initial_carry(2)
        x = jnp.ones((2, 4))
        params = model.init(rng, x, carry)

        apply_fn = lambda p, x, c: model.apply(p, x, c)
        xs = jnp.ones((5, 2, 4))
        resets = jnp.zeros((5, 2), bool)
        ys, final = unroll(apply_fn, params, xs, carry, resets)
        assert ys.shape == (5, 2, 8)

        # Resetting at every step == single-step outputs everywhere.
        ys_reset, _ = unroll(
            apply_fn, params, xs, carry, jnp.ones((5, 2), bool)
        )
        one, _ = model.apply(params, x, carry)
        np.testing.assert_allclose(
            np.asarray(ys_reset[3]), np.asarray(one), rtol=1e-5
        )
        # Without resets, state accumulates (outputs differ over time).
        assert not np.allclose(np.asarray(ys[0]), np.asarray(ys[4]))

    def test_gru_module(self, rng):
        m = GRUCellModule(6)
        c = m.initial_carry(3)
        x = jnp.ones((3, 4))
        params = m.init(rng, x, c)
        y, c2 = m.apply(params, x, c)
        assert y.shape == (3, 6)


class TestBranched:
    def test_tuple_output(self, rng):
        m = Branched(branches=(nn.Dense(3), nn.Dense(5)))
        x = jnp.ones((2, 4))
        params = m.init(rng, x)
        a, b = m.apply(params, x)
        assert a.shape == (2, 3) and b.shape == (2, 5)


class TestNewQFunctionVariants:
    """The reference's remaining q-function variants
    (pfrl/q_functions/state_action_q_functions.py:11-296,
    state_q_functions.py:26-94)."""

    def test_single_model_state_q_function(self, rng):
        import flax.linen as nn

        from pfrl_tpu.q_functions import (
            SingleModelStateQFunctionWithDiscreteAction,
        )

        qf = SingleModelStateQFunctionWithDiscreteAction(
            model=nn.Dense(4)
        )
        x = jnp.ones((3, 5))
        params = qf.init(rng, x)
        av = qf.apply(params, x)
        assert av.q_values.shape == (3, 4)
        assert av.greedy_actions().shape == (3,)

    def test_distributional_single_model(self, rng):
        import flax.linen as nn

        from pfrl_tpu.q_functions import (
            DistributionalSingleModelStateQFunctionWithDiscreteAction,
        )

        class Atoms(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = nn.Dense(4 * 11)(x)
                return nn.softmax(h.reshape(x.shape[0], 4, 11), axis=-1)

        z = tuple(float(v) for v in np.linspace(-1, 1, 11))
        qf = DistributionalSingleModelStateQFunctionWithDiscreteAction(
            model=Atoms(), z_values=z
        )
        x = jnp.ones((3, 5))
        params = qf.init(rng, x)
        av = qf.apply(params, x)
        assert av.q_values.shape == (3, 4)
        np.testing.assert_allclose(
            np.asarray(av.q_values),
            np.einsum("baz,z->ba", np.asarray(av.q_dist), np.asarray(z)),
            rtol=1e-5,
        )

    def test_single_model_state_action_q_function(self, rng):
        import flax.linen as nn

        from pfrl_tpu.q_functions import SingleModelStateActionQFunction

        class Bilinear(nn.Module):
            @nn.compact
            def __call__(self, s, a):
                return nn.Dense(1)(jnp.concatenate([s, a], -1))

        qf = SingleModelStateActionQFunction(model=Bilinear())
        s, a = jnp.ones((3, 5)), jnp.ones((3, 2))
        params = qf.init(rng, s, a)
        q = qf.apply(params, s, a)
        assert q.shape == (3,)

    def test_late_action_q_function(self, rng):
        from pfrl_tpu.q_functions import FCLateActionSAQFunction

        qf = FCLateActionSAQFunction(n_hidden_channels=16, n_hidden_layers=2)
        s, a = jnp.ones((3, 5)), jnp.ones((3, 2))
        params = qf.init(rng, s, a)
        q = qf.apply(params, s, a)
        assert q.shape == (3,)
        # DDPG-paper wiring: the first layer sees only the observation.
        flat = {
            jax.tree_util.keystr(p): x
            for p, x in jax.tree_util.tree_leaves_with_path(params)
        }
        first_kernels = [
            v for k, v in flat.items() if "MLP_0" in k and "kernel" in k
        ]
        assert any(k.shape[0] == 5 for k in first_kernels)  # obs dims only

    def test_bn_late_action_q_function(self, rng):
        from pfrl_tpu.q_functions import FCBNLateActionSAQFunction

        qf = FCBNLateActionSAQFunction(n_hidden_channels=16, n_hidden_layers=2)
        s, a = jnp.ones((3, 5)), jnp.ones((3, 2))
        variables = qf.init(rng, s, a)
        assert "batch_stats" in variables
        q, mutated = qf.apply(
            variables, s, a, mutable=["batch_stats"]
        )
        assert q.shape == (3,)

    def test_fc_lstm_sa_q_function(self, rng):
        """The reference stubs FCLSTMSAQFunction with NotImplementedError
        (state_action_q_functions.py:92-96); ours works."""
        from pfrl_tpu.q_functions import FCLSTMSAQFunction

        qf = FCLSTMSAQFunction(n_hidden_channels=8, n_hidden_layers=1)
        s, a = jnp.ones((3, 5)), jnp.ones((3, 2))
        carry = qf.initial_carry(3)
        params = qf.init(rng, s, a, carry)
        q, carry2 = qf.apply(params, s, a, carry)
        assert q.shape == (3,)
        # Carry changes state across steps.
        q2, carry3 = qf.apply(params, s, a, carry2)
        assert not np.allclose(np.asarray(q), np.asarray(q2))


class TestLowerTriangularMatrix:
    """reference: tests/functions_tests/test_lower_triangular_matrix.py."""

    def test_assembles_batch(self):
        from pfrl_tpu.functions import lower_triangular_matrix

        diag = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        non_diag = jnp.asarray([[7.0, 8.0, 9.0], [10.0, 11.0, 12.0]])
        m = np.asarray(lower_triangular_matrix(diag, non_diag))
        expected0 = np.array([[1, 0, 0], [7, 2, 0], [8, 9, 3]], np.float32)
        expected1 = np.array([[4, 0, 0], [10, 5, 0], [11, 12, 6]], np.float32)
        np.testing.assert_allclose(m[0], expected0)
        np.testing.assert_allclose(m[1], expected1)

    def test_gradients_flow(self, rng):
        from pfrl_tpu.functions import lower_triangular_matrix

        def f(d, nd):
            return jnp.sum(lower_triangular_matrix(d, nd) ** 2)

        d = jnp.ones((1, 3))
        nd = jnp.ones((1, 3)) * 2
        gd, gnd = jax.grad(f, argnums=(0, 1))(d, nd)
        np.testing.assert_allclose(gd, 2 * np.ones((1, 3)))
        np.testing.assert_allclose(gnd, 4 * np.ones((1, 3)))
