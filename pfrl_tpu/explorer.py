"""Explorer protocol.

Reference parity: pfrl/explorer.py:4-17 — but functional: an explorer is a
pure function of ``(rng, t, greedy_actions, action_value)`` returning
possibly-randomized batched actions, so it jits into the act step. ``t`` is
a device scalar; schedules (linear/exp decay) are computed branchlessly.
"""

import jax


class Explorer:
    def select_action(
        self,
        rng: jax.Array,
        t: jax.Array,
        greedy_actions: jax.Array,
        action_value=None,
    ) -> jax.Array:
        """Batched action selection. Must be jit-traceable."""
        raise NotImplementedError
