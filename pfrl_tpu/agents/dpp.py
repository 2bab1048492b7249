"""Dynamic Policy Programming (DPP) — reference parity: pfrl/agents/dpp.py:9-127.

DPP's Bellman operator uses a Boltzmann-softmax backup with inverse
temperature eta over the *preference* function P, giving the soft target
``r + gamma * boltzmann_mean(P(s')) + (P(s,a) - boltzmann_mean(P(s)))``.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.dqn import DQN, DQNCore
from pfrl_tpu.replay.transition import TransitionBatch


def _boltzmann_backup(q: jax.Array, eta: float) -> jax.Array:
    """sum_a softmax(eta*q)_a * q_a, numerically stable (dpp.py:24-44)."""
    pi = jax.nn.softmax(eta * q, axis=-1)
    return jnp.sum(pi * q, axis=-1)


class DPPCore(DQNCore):
    def __init__(self, *args, eta: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.eta = eta

    def compute_y_and_t(self, params, target_params, rng, batch: TransitionBatch):
        rng_on, rng_cur, rng_next = jax.random.split(rng, 3)
        av = self.action_value(params, rng_on, batch.obs)
        y = av.evaluate_actions(batch.action)

        cur_tgt = self.action_value(target_params, rng_cur, batch.obs)
        next_tgt = self.action_value(target_params, rng_next, batch.next_obs)

        nonterminal = 1.0 - batch.is_terminal.astype(jnp.float32)
        next_backup = _boltzmann_backup(next_tgt.q_values, self.eta)
        cur_backup = _boltzmann_backup(cur_tgt.q_values, self.eta)
        t = (
            batch.reward
            + batch.discount * nonterminal * next_backup
            + cur_tgt.evaluate_actions(batch.action)
            - cur_backup
        )
        return y, jax.lax.stop_gradient(t)


class DPP(DQN):
    default_core = DPPCore
