"""Categorical DQN (C51) and its Double variant.

Reference parity: pfrl/agents/categorical_dqn.py:105-204 (cross-entropy
loss over projected target distributions, KL-based PER priorities) and
categorical_double_dqn.py:10-52.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.dqn import DQN, DQNCore
from pfrl_tpu.ops.categorical import categorical_projection
from pfrl_tpu.replay.transition import TransitionBatch


class CategoricalDQNCore(DQNCore):
    def target_distribution(self, params, target_params, rng, batch):
        """Greedy-from-target distribution (categorical_dqn.py:121-140)."""
        next_av = self.action_value(target_params, rng, batch.next_obs)
        return next_av.max_as_distribution(), next_av.z_values

    def compute_loss_components(self, params, target_params, rng, batch: TransitionBatch):
        rng_on, rng_tgt = jax.random.split(rng)
        next_dist, z = self.target_distribution(params, target_params, rng_tgt, batch)
        # Shifted/shrunk support: r + gamma^k z (terminal -> just r).
        Tz = batch.reward[:, None] + (
            1.0 - batch.is_terminal.astype(jnp.float32)
        )[:, None] * batch.discount[:, None] * z[None, :]
        target_probs = categorical_projection(
            Tz, next_dist, z
        )
        av = self.action_value(params, rng_on, batch.obs)
        pred = av.evaluate_actions_as_distribution(batch.action)
        eltwise = -jnp.sum(
            jax.lax.stop_gradient(target_probs) * jnp.log(pred + 1e-10), axis=1
        )
        return eltwise, av

    def loss_and_errors(self, params, target_params, rng, batch: TransitionBatch):
        eltwise, av = self.compute_loss_components(
            params, target_params, rng, batch
        )
        weighted = eltwise * batch.weight
        if self.batch_accumulator == "mean":
            loss = jnp.sum(weighted) / eltwise.shape[0]
        else:
            loss = jnp.sum(weighted)
        # PER priorities: the cross-entropy itself (KL up to const),
        # matching categorical_dqn.py:183-192.
        return loss, (jax.lax.stop_gradient(eltwise), jnp.mean(av.q_values))


class CategoricalDoubleDQNCore(CategoricalDQNCore):
    def target_distribution(self, params, target_params, rng, batch):
        """Online argmax, target distribution (categorical_double_dqn.py:10-52)."""
        rng_on, rng_tgt = jax.random.split(rng)
        next_online = self.action_value(params, rng_on, batch.next_obs)
        greedy = next_online.greedy_actions()
        next_target = self.action_value(target_params, rng_tgt, batch.next_obs)
        dist = next_target.evaluate_actions_as_distribution(greedy)
        return dist, next_target.z_values


class CategoricalDQN(DQN):
    default_core = CategoricalDQNCore


class CategoricalDoubleDQN(DQN):
    default_core = CategoricalDoubleDQNCore
