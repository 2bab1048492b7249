"""Double DQN (reference parity: pfrl/agents/double_dqn.py:6-40).

Greedy action from the online network, evaluated by the target network.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.dqn import DQN, DQNCore
from pfrl_tpu.replay.transition import TransitionBatch


class DoubleDQNCore(DQNCore):
    def compute_y_and_t(self, params, target_params, rng, batch: TransitionBatch):
        rng_on, rng_next, rng_tgt = jax.random.split(rng, 3)
        av = self.action_value(params, rng_on, batch.obs)
        y = av.evaluate_actions(batch.action)
        next_online = self.action_value(params, rng_next, batch.next_obs)
        greedy = next_online.greedy_actions()
        next_target = self.action_value(target_params, rng_tgt, batch.next_obs)
        next_q = next_target.evaluate_actions(greedy)
        t = batch.reward + batch.discount * (
            1.0 - batch.is_terminal.astype(jnp.float32)
        ) * jax.lax.stop_gradient(next_q)
        return y, jax.lax.stop_gradient(t)


class DoubleDQN(DQN):
    default_core = DoubleDQNCore
