"""Boltzmann exploration (reference parity: pfrl/explorers/boltzmann.py:8-30)."""

import jax

from pfrl_tpu.explorer import Explorer


class Boltzmann(Explorer):
    """Sample from softmax(Q / T)."""

    def __init__(self, T: float = 1.0):
        self.T = T

    def select_action(self, rng, t, greedy_actions, action_value=None):
        assert action_value is not None, "Boltzmann needs the ActionValue"
        logits = action_value.q_values / self.T
        return jax.random.categorical(rng, logits, axis=-1).astype(
            greedy_actions.dtype
        )
