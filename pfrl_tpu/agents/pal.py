"""Persistent Advantage Learning (PAL) and Double PAL.

Reference parity: pfrl/agents/pal.py:7-77, double_pal.py:7-72. The PAL
operator takes the max of the AL correction at s and s'.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.al import ALCore
from pfrl_tpu.agents.dqn import DQN
from pfrl_tpu.replay.transition import TransitionBatch


class PALCore(ALCore):
    def compute_y_and_t(self, params, target_params, rng, batch: TransitionBatch):
        rng_on, rng_cur, rng_next = jax.random.split(rng, 3)
        av = self.action_value(params, rng_on, batch.obs)
        y = av.evaluate_actions(batch.action)

        cur_tgt = self.action_value(target_params, rng_cur, batch.obs)
        next_tgt = self.action_value(target_params, rng_next, batch.next_obs)

        nonterminal = 1.0 - batch.is_terminal.astype(jnp.float32)
        base = batch.reward + batch.discount * nonterminal * next_tgt.max()
        al_gap = cur_tgt.max() - cur_tgt.evaluate_actions(batch.action)
        # "Persistent" gap at the next state for the same action.
        pal_gap = next_tgt.max() - next_tgt.evaluate_actions(batch.action)
        t = base - self.alpha * jnp.minimum(al_gap, pal_gap)
        return y, jax.lax.stop_gradient(t)


class DoublePALCore(PALCore):
    def compute_y_and_t(self, params, target_params, rng, batch: TransitionBatch):
        rng_on, rng_cur, rng_next, rng_sel = jax.random.split(rng, 4)
        av = self.action_value(params, rng_on, batch.obs)
        y = av.evaluate_actions(batch.action)

        cur_tgt = self.action_value(target_params, rng_cur, batch.obs)
        next_tgt = self.action_value(target_params, rng_next, batch.next_obs)
        next_online = self.action_value(params, rng_sel, batch.next_obs)
        greedy = next_online.greedy_actions()

        nonterminal = 1.0 - batch.is_terminal.astype(jnp.float32)
        base = batch.reward + batch.discount * nonterminal * next_tgt.evaluate_actions(greedy)
        al_gap = cur_tgt.max() - cur_tgt.evaluate_actions(batch.action)
        pal_gap = next_tgt.max() - next_tgt.evaluate_actions(batch.action)
        t = base - self.alpha * jnp.minimum(al_gap, pal_gap)
        return y, jax.lax.stop_gradient(t)


class PAL(DQN):
    default_core = PALCore


class DoublePAL(DQN):
    default_core = DoublePALCore
