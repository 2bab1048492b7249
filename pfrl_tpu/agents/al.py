"""Advantage Learning (AL) — reference parity: pfrl/agents/al.py:7-78.

Bellman-operator variant: target subtracts an advantage-correction term
``alpha * (maxQ_tgt(s) - Q_tgt(s, a))`` from the DQN target.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.dqn import DQN, DQNCore
from pfrl_tpu.replay.transition import TransitionBatch


class ALCore(DQNCore):
    alpha: float = 0.9

    def __init__(self, *args, alpha: float = 0.9, **kwargs):
        super().__init__(*args, **kwargs)
        self.alpha = alpha

    def compute_y_and_t(self, params, target_params, rng, batch: TransitionBatch):
        rng_on, rng_cur, rng_next = jax.random.split(rng, 3)
        av = self.action_value(params, rng_on, batch.obs)
        y = av.evaluate_actions(batch.action)

        cur_tgt = self.action_value(target_params, rng_cur, batch.obs)
        next_tgt = self.action_value(target_params, rng_next, batch.next_obs)

        base = batch.reward + batch.discount * (
            1.0 - batch.is_terminal.astype(jnp.float32)
        ) * next_tgt.max()
        advantage = cur_tgt.max() - cur_tgt.evaluate_actions(batch.action)
        t = base - self.alpha * advantage
        return y, jax.lax.stop_gradient(t)


class AL(DQN):
    default_core = ALCore
