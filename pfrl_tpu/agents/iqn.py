"""IQN — Implicit Quantile Networks.

Reference parity: pfrl/agents/iqn.py:258-433. Quantile thresholds are iid
U(0,1): N for prediction, N' for targets, K for action selection; greedy
eval uses the deterministic midpoint grid (iqn.py:416-433).
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.dqn import DQN, DQNCore
from pfrl_tpu.utils.precision import cast_floating, cast_to_float32
from pfrl_tpu.ops.quantile import (
    eltwise_huber_quantile_loss,
)
from pfrl_tpu.replay.transition import TransitionBatch


class IQNCore(DQNCore):
    def __init__(
        self,
        *args,
        quantile_thresholds_N: int = 64,
        quantile_thresholds_N_prime: int = 64,
        quantile_thresholds_K: int = 32,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.N = quantile_thresholds_N
        self.N_prime = quantile_thresholds_N_prime
        self.K = quantile_thresholds_K

    def _model_init_args(self, x):
        batch = jax.tree.leaves(x)[0].shape[0]
        taus = jnp.zeros((batch, self.K), jnp.float32)
        return (x, taus)

    # ------------------------------------------------------------------- act
    def action_value(self, params, rng, obs, taus=None):
        x = self.phi(obs)
        batch = jax.tree.leaves(x)[0].shape[0]
        if taus is None:
            # Deterministic eval grid (iqn.py:416-433).
            taus = jnp.broadcast_to(
                (jnp.arange(self.K, dtype=jnp.float32) + 0.5) / self.K,
                (batch, self.K),
            )
        av = self.model.apply(
            cast_floating(params, self.compute_dtype),
            cast_floating(x, self.compute_dtype),
            taus,
            rngs={"noise": rng},
        )
        return cast_to_float32(av) if self.compute_dtype is not None else av

    def select_action(self, state, rng, obs, t, training: bool):
        rng_noise, rng_tau, rng_explore = jax.random.split(rng, 3)
        if training:
            batch = jax.tree.leaves(obs)[0].shape[0]
            taus = jax.random.uniform(rng_tau, (batch, self.K))
            av = self.action_value(state.params, rng_noise, obs, taus)
            greedy = av.greedy_actions()
            return self.explorer.select_action(rng_explore, t, greedy, av)
        av = self.action_value(state.params, rng_noise, obs)
        return av.greedy_actions()

    # ---------------------------------------------------------------- update
    def loss_and_errors(self, params, target_params, rng, batch: TransitionBatch):
        rng_n, rng_np, rng_on, rng_tgt, rng_sel = jax.random.split(rng, 5)
        B = batch.reward.shape[0]
        taus = jax.random.uniform(rng_n, (B, self.N))
        taus_prime = jax.random.uniform(rng_np, (B, self.N_prime))

        av = self.action_value(params, rng_on, batch.obs, taus)
        y = av.evaluate_actions_as_quantiles(batch.action)  # [B, N]

        target_av = self.action_value(
            target_params, rng_tgt, batch.next_obs, taus_prime
        )
        greedy = self.target_greedy_actions(
            params, target_params, rng_sel, batch, target_av
        )
        next_quantiles = target_av.evaluate_actions_as_quantiles(greedy)  # [B, N']
        nonterminal = 1.0 - batch.is_terminal.astype(jnp.float32)
        t = (
            batch.reward[:, None]
            + batch.discount[:, None] * nonterminal[:, None] * next_quantiles
        )
        el = eltwise_huber_quantile_loss(y, jax.lax.stop_gradient(t), taus)
        per_example = jnp.sum(jnp.mean(el, axis=2), axis=1)  # [B]
        weighted = per_example * batch.weight
        if self.batch_accumulator == "mean":
            loss = jnp.sum(weighted) / B
        else:
            loss = jnp.sum(weighted)
        return loss, (
            jax.lax.stop_gradient(per_example),
            jnp.mean(av.q_values),
        )

    def target_greedy_actions(self, params, target_params, rng, batch, target_av):
        """Greedy w.r.t. the target net's mean quantiles (IQN default)."""
        del params, rng, batch
        return target_av.greedy_actions()


class DoubleIQNCore(IQNCore):
    def target_greedy_actions(self, params, target_params, rng, batch, target_av):
        rng_on, rng_tau = jax.random.split(rng)
        B = batch.reward.shape[0]
        taus = jax.random.uniform(rng_tau, (B, self.K))
        online_av = self.action_value(params, rng_on, batch.next_obs, taus)
        return online_av.greedy_actions()


class IQN(DQN):
    default_core = IQNCore


class DoubleIQN(DQN):
    default_core = DoubleIQNCore
