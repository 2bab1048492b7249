"""Greedy (no exploration) — reference parity: pfrl/explorers/greedy.py."""

from pfrl_tpu.explorer import Explorer


class Greedy(Explorer):
    def select_action(self, rng, t, greedy_actions, action_value=None):
        return greedy_actions
