"""Deterministic chain-MDP test env (reference parity: pfrl/envs/abc.py:7-162).

The backbone of the agent integration tests: on state ``n`` only action ``n``
advances; completing the chain yields reward +1. Supports discrete /
continuous (softmax-logit) actions, partial observability via an
episode-random observation offset, and episodic / continuing dynamics —
re-expressed as a branchless pure function over int32 state.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class ABCState:
    s: jax.Array        # int32 current chain position (size == terminal)
    offset: jax.Array   # int32 observation shift for PO episodes
    episode: jax.Array  # int32 episode counter (drives deterministic PO offsets)


class ABC(JaxEnv):
    def __init__(
        self,
        size: int = 2,
        discrete: bool = True,
        partially_observable: bool = False,
        episodic: bool = True,
        deterministic: bool = False,
    ):
        self.size = size
        self.discrete = discrete
        self.partially_observable = partially_observable
        self.episodic = episodic
        self.deterministic = deterministic
        self.n_max_offset = 1
        self.n_dim_obs = size + 1 + self.n_max_offset
        self.observation_space = spaces.box(-jnp.inf, jnp.inf, (self.n_dim_obs,))
        if discrete:
            self.action_space = spaces.Discrete(size)
        else:
            self.action_space = spaces.box(-1.0, 1.0, (size,))

    def _observe(self, state: ABCState) -> jax.Array:
        return jax.nn.one_hot(state.s + state.offset, self.n_dim_obs, dtype=jnp.float32)

    def _new_offset(self, rng, episode):
        if not self.partially_observable:
            return jnp.int32(0)
        if self.deterministic:
            return (episode % (self.n_max_offset + 1)).astype(jnp.int32)
        return jax.random.randint(rng, (), 0, self.n_max_offset + 1)

    def reset(self, rng: jax.Array) -> Tuple[ABCState, jax.Array]:
        # Matches reference reset semantics: deterministic PO offset alternates
        # starting at 1 (reference increments from an initial 0).
        episode = jnp.int32(1)
        state = ABCState(
            s=jnp.int32(0), offset=self._new_offset(rng, episode), episode=episode
        )
        return state, self._observe(state)

    def step(self, rng: jax.Array, state: ABCState, action: jax.Array) -> Tuple[ABCState, TimeStep]:
        rng_a, rng_off = jax.random.split(rng)
        if not self.discrete:
            a = jnp.clip(action, -1.0, 1.0)
            if self.deterministic:
                inner = jnp.argmax(a).astype(jnp.int32)
            else:
                inner = jax.random.categorical(rng_a, a).astype(jnp.int32)
        else:
            inner = action.astype(jnp.int32)

        correct = inner == state.s
        at_goal = correct & (state.s == self.size - 1)
        reward = jnp.where(at_goal, 1.0, 0.0)

        if self.episodic:
            terminated = at_goal | ~correct
            next_s = jnp.where(
                terminated, jnp.int32(self.size), jnp.where(correct, state.s + 1, state.s)
            )
        else:
            terminated = jnp.zeros((), bool)
            next_s = jnp.where(
                at_goal, jnp.int32(0), jnp.where(correct, state.s + 1, state.s)
            )

        new_state = ABCState(s=next_s, offset=state.offset, episode=state.episode)
        ts = TimeStep(
            obs=self._observe(new_state),
            reward=reward,
            terminated=terminated,
            truncated=jnp.zeros((), bool),
        )
        # Pre-compute what a reset would give (the runner reuses reset()).
        del rng_off
        return new_state, ts
