"""Twin-critic fusion (stacked vmapped apply) vs separate applies.

SACCore/TD3Core evaluate identical twin critics as one [2, B] batched
apply on TPU-friendly shapes; this pins the fused path numerically against
the two-apply path (same params, same batch, one update step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn
import pytest

from pfrl_tpu.agents.soft_actor_critic import SACCore
from pfrl_tpu.agents.td3 import TD3Core
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import DeterministicHead, SquashedGaussianHead
from pfrl_tpu.q_functions import FCSAQFunction
from pfrl_tpu.replay.transition import TransitionBatch


def _batch(rng, obs_dim=5, act_dim=3, n=16):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return TransitionBatch(
        obs=jax.random.normal(k1, (n, obs_dim)),
        action=jax.random.uniform(k2, (n, act_dim), minval=-1, maxval=1),
        reward=jax.random.normal(k3, (n,)),
        next_obs=jax.random.normal(k4, (n, obs_dim)),
        discount=jnp.full((n,), 0.99),
        is_terminal=jnp.zeros((n,), bool),
        weight=jnp.ones((n,)),
        indices=jnp.arange(n),
        extras={},
    )


class _SacPolicy(nn.Module):
    act_dim: int = 3

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=2 * self.act_dim, hidden_sizes=(32,))(x)
        return SquashedGaussianHead(action_size=self.act_dim)(h)


class _Det(nn.Module):
    act_dim: int = 3

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=self.act_dim, hidden_sizes=(32,))(x)
        return DeterministicHead()(nn.tanh(h))


def _qf():
    return FCSAQFunction(n_hidden_layers=1, n_hidden_channels=32)


def _assert_tree_close(a, b, atol=1e-5):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5
        ),
        a,
        b,
    )


@pytest.mark.parametrize("core_kind", ["sac", "td3"])
def test_fused_matches_separate(rng, core_kind):
    if core_kind == "sac":
        def make():
            return SACCore(
                policy=_SacPolicy(),
                q_func1=_qf(),
                q_func2=_qf(),
                policy_optimizer=optax.adam(1e-3),
                q_func1_optimizer=optax.adam(1e-3),
                q_func2_optimizer=optax.adam(1e-3),
                entropy_target=-3.0,
            )
    else:
        def make():
            return TD3Core(
                policy=_Det(),
                q_func1=_qf(),
                q_func2=_qf(),
                policy_optimizer=optax.adam(1e-3),
                q_func1_optimizer=optax.adam(1e-3),
                q_func2_optimizer=optax.adam(1e-3),
            )

    obs = jnp.zeros((4, 5))
    act = jnp.zeros((4, 3))
    core_f = make()
    core_s = make()
    state_f = core_f.init(jax.random.PRNGKey(0), obs, act)
    state_s = core_s.init(jax.random.PRNGKey(0), obs, act)
    assert core_f._twin_fused
    core_s._twin_fused = False  # force the two-apply path

    batch = _batch(jax.random.fold_in(rng, 1))
    upd_rng = jax.random.PRNGKey(7)
    for i in range(3):
        state_f, aux_f = core_f.update(state_f, jax.random.fold_in(upd_rng, i), batch)
        state_s, aux_s = core_s.update(state_s, jax.random.fold_in(upd_rng, i), batch)
    _assert_tree_close(state_f.q1_params, state_s.q1_params)
    _assert_tree_close(state_f.q2_params, state_s.q2_params)
    _assert_tree_close(state_f.policy_params, state_s.policy_params)
    np.testing.assert_allclose(
        float(aux_f["loss"]), float(aux_s["loss"]), rtol=1e-5
    )
