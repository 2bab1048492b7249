"""Epsilon-greedy explorers (reference parity: pfrl/explorers/epsilon_greedy.py:15-135).

All schedules are pure functions of the device step counter ``t`` so they
trace into the jitted act step — no host-side mutable epsilon.
"""

import jax
import jax.numpy as jnp

from pfrl_tpu.explorer import Explorer


def _epsilon_greedy(rng, epsilon, greedy_actions, n_actions):
    rng_mask, rng_rand = jax.random.split(rng)
    batch = greedy_actions.shape[0]
    explore = jax.random.uniform(rng_mask, (batch,)) < epsilon
    random_actions = jax.random.randint(
        rng_rand, (batch,), 0, n_actions, dtype=greedy_actions.dtype
    )
    return jnp.where(explore, random_actions, greedy_actions)


class ConstantEpsilonGreedy(Explorer):
    """epsilon_greedy.py:50-72."""

    def __init__(self, epsilon: float, n_actions: int):
        self.epsilon = epsilon
        self.n_actions = n_actions

    def epsilon_at(self, t):
        return jnp.full((), self.epsilon, jnp.float32)

    def select_action(self, rng, t, greedy_actions, action_value=None):
        return _epsilon_greedy(rng, self.epsilon_at(t), greedy_actions, self.n_actions)


class LinearDecayEpsilonGreedy(Explorer):
    """Linear anneal start->end over decay_steps (epsilon_greedy.py:75-110)."""

    def __init__(self, start_epsilon: float, end_epsilon: float, decay_steps: int, n_actions: int):
        assert 0 <= end_epsilon <= start_epsilon <= 1
        self.start_epsilon = start_epsilon
        self.end_epsilon = end_epsilon
        self.decay_steps = decay_steps
        self.n_actions = n_actions

    def epsilon_at(self, t):
        frac = jnp.clip(t.astype(jnp.float32) / self.decay_steps, 0.0, 1.0)
        return self.start_epsilon + frac * (self.end_epsilon - self.start_epsilon)

    def select_action(self, rng, t, greedy_actions, action_value=None):
        return _epsilon_greedy(rng, self.epsilon_at(t), greedy_actions, self.n_actions)


class ExponentialDecayEpsilonGreedy(Explorer):
    """epsilon = max(end, start * decay^t) (epsilon_greedy.py:113-135)."""

    def __init__(self, start_epsilon: float, end_epsilon: float, decay: float, n_actions: int):
        self.start_epsilon = start_epsilon
        self.end_epsilon = end_epsilon
        self.decay = decay
        self.n_actions = n_actions

    def epsilon_at(self, t):
        eps = self.start_epsilon * jnp.power(self.decay, t.astype(jnp.float32))
        return jnp.maximum(eps, self.end_epsilon)

    def select_action(self, rng, t, greedy_actions, action_value=None):
        return _epsilon_greedy(rng, self.epsilon_at(t), greedy_actions, self.n_actions)
