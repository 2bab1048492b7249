"""Delayed-cue memory env: the workload random-offset recurrent replay exists for.

A fixed-length episode of ``episode_len`` steps. At ``reveal_step`` the
observation shows a random binary cue; at the FINAL step the agent is
rewarded +1 for taking the action matching the cue and -1 otherwise. All
other rewards are zero, so every reward-relevant transition lives in the
episode's tail:

* Replay windows of ``subseq_len < episode_len - reveal_step`` taken only
  from episode prefixes (round-3 behavior) never contain the reveal or the
  reward — the agent provably cannot learn.
* Random-offset windows (pfrl/replay_buffer.py:149-154 semantics) cover the
  tail; windows starting at the reveal step carry cue→action credit within
  one BPTT unroll, and the stored behavior-time carries warm-start windows
  that begin after the reveal.

This is the in-repo analog of the reference's DRQN FlickerFrame use case
(pfrl/wrappers/atari_wrappers.py FlickerFrame): memory across more steps
than one replay window.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class DelayedCueState:
    t: jax.Array     # int32 step index (0-based; obs for step t is shown)
    cue: jax.Array   # int32 0/1, sampled at reset


class DelayedCue(JaxEnv):
    """Observation: one-hot of the step index (episode_len dims) plus one
    cue channel that reads ±1 only at ``reveal_step`` and 0 elsewhere."""

    def __init__(self, episode_len: int = 12, reveal_step: int = 8):
        assert 0 <= reveal_step < episode_len - 1
        self.episode_len = episode_len
        self.reveal_step = reveal_step
        self.max_episode_steps = episode_len
        self.n_dim_obs = episode_len + 1
        self.observation_space = spaces.box(-1.0, 1.0, (self.n_dim_obs,))
        self.action_space = spaces.Discrete(2)

    def _observe(self, state: DelayedCueState) -> jax.Array:
        phase = jax.nn.one_hot(state.t, self.episode_len, dtype=jnp.float32)
        cue_chan = jnp.where(
            state.t == self.reveal_step,
            2.0 * state.cue.astype(jnp.float32) - 1.0,
            0.0,
        )
        return jnp.concatenate([phase, cue_chan[None]])

    def reset(self, rng: jax.Array) -> Tuple[DelayedCueState, jax.Array]:
        state = DelayedCueState(
            t=jnp.int32(0), cue=jax.random.bernoulli(rng).astype(jnp.int32)
        )
        return state, self._observe(state)

    def step(
        self, rng: jax.Array, state: DelayedCueState, action: jax.Array
    ) -> Tuple[DelayedCueState, TimeStep]:
        del rng
        last = state.t == self.episode_len - 1
        match = action.astype(jnp.int32) == state.cue
        reward = jnp.where(
            last, jnp.where(match, 1.0, -1.0), 0.0
        ).astype(jnp.float32)
        new_state = DelayedCueState(t=state.t + 1, cue=state.cue)
        ts = TimeStep(
            obs=self._observe(
                new_state.replace(t=jnp.minimum(new_state.t, self.episode_len - 1))
            ),
            reward=reward,
            terminated=last,
            truncated=jnp.zeros((), bool),
        )
        return new_state, ts
