"""Vmapped auto-resetting vector env over a pure-JAX env.

This is the TPU-native replacement for the reference's
MultiprocessVectorEnv (pfrl/envs/multiprocess_vector_env.py:11-141): instead
of one OS process + pipe per env, N env instances become one vmapped pure
function whose state lives on device, fused by XLA into the same program as
the agent's act/update. Auto-reset keeps every lane full: when an episode
ends the lane restarts immediately, while the pre-reset observation is still
surfaced for correct bootstrapping (the reference gets the same effect from
its masked ``reset(mask)`` protocol, pfrl/env.py:33-43).
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.env import JaxEnv, TimeStep
from pfrl_tpu.utils.pytree import tree_where


@struct.dataclass
class VecStep:
    """Batched step result.

    ``ts.obs`` is the *true* next observation (terminal obs on episode end) —
    what goes into the replay transition; ``obs`` is the post-auto-reset
    observation the agent acts on next step.
    """

    ts: TimeStep
    obs: Any


class VectorJaxEnv:
    def __init__(self, env: JaxEnv, num_envs: int):
        self.env = env
        self._num_envs = num_envs
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self._reset1 = env.reset
        self._step1 = env.step

    @property
    def num_envs(self) -> int:
        return self._num_envs

    def reset(self, rng: jax.Array) -> Tuple[Any, Any]:
        keys = jax.random.split(rng, self._num_envs)
        return jax.vmap(self._reset1)(keys)

    def step(self, rng: jax.Array, states: Any, actions: jax.Array) -> Tuple[Any, VecStep]:
        keys = jax.random.split(rng, 2 * self._num_envs)
        step_keys = keys[: self._num_envs]
        reset_keys = keys[self._num_envs :]
        new_states, ts = jax.vmap(self._step1)(step_keys, states, actions)
        reset_states, reset_obs = jax.vmap(self._reset1)(reset_keys)
        done = ts.terminated | ts.truncated
        out_states = tree_where(done, reset_states, new_states)
        next_obs = tree_where(done, reset_obs, ts.obs)
        return out_states, VecStep(ts=ts, obs=next_obs)
