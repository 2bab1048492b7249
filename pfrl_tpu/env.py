"""Environment protocols.

Two worlds coexist, by design:

1. **Host envs** — the reference-compatible object protocols ``Env``
   (pfrl/env.py:4-20) and ``VectorEnv`` (pfrl/env.py:23-55) for external
   simulators (Atari, MuJoCo) driven from Python. These feed the device via
   the batched drivers in :mod:`pfrl_tpu.experiments`.

2. **Device envs** — :class:`JaxEnv`: pure functions ``reset(rng) -> (state,
   obs)`` and ``step(rng, state, action) -> (state, TimeStep)`` over static
   shapes. These are vmapped into vector envs and fused into the single
   jitted actor-learner loop (:mod:`pfrl_tpu.experiments.runner`), which is
   where the reference's per-step Python ``act``/``observe``/pipe round-trips
   disappear.

The ``terminated`` / ``truncated`` split carries the reference's ``done`` vs
``info['needs_reset']`` distinction (pfrl/wrappers/continuing_time_limit.py:4-41):
bootstrapping continues through truncation but not termination.
"""

from typing import Any, Optional, Tuple

import jax
from flax import struct


class Env:
    """Host RL environment (reference parity: pfrl/env.py:4-20)."""

    observation_space = None
    action_space = None

    def step(self, action) -> Tuple[Any, float, bool, dict]:
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError

    def close(self):
        pass


class VectorEnv:
    """Host vectorized env (reference parity: pfrl/env.py:23-55).

    ``reset(mask)`` only resets envs where ``mask`` is falsy; envs with a
    true mask keep running and return their last observation.
    """

    observation_space = None
    action_space = None

    @property
    def num_envs(self) -> int:
        raise NotImplementedError

    def step(self, actions):
        raise NotImplementedError

    def reset(self, mask=None):
        raise NotImplementedError

    def seed(self, seeds=None):
        raise NotImplementedError

    def close(self):
        pass

    @property
    def unwrapped(self):
        return self


@struct.dataclass
class TimeStep:
    """One transition's worth of env output (pre-auto-reset).

    ``obs`` is the observation after the step (the true next observation —
    the runner handles auto-reset separately so bootstrapping sees the
    terminal observation, matching batch_experiences' next_state semantics,
    pfrl/replay_buffer.py:183-206).
    """

    obs: Any
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array

    @property
    def done(self) -> jax.Array:
        return self.terminated | self.truncated


class JaxEnv:
    """Pure-functional device environment.

    Subclasses are plain Python objects whose fields are static config; all
    dynamics live in ``reset``/``step`` which must be jit-traceable. The
    per-env state is an arbitrary pytree.
    """

    observation_space = None
    action_space = None
    max_episode_steps: Optional[int] = None

    def reset(self, rng: jax.Array) -> Tuple[Any, Any]:
        """-> (state, obs)"""
        raise NotImplementedError

    def step(self, rng: jax.Array, state: Any, action: jax.Array) -> Tuple[Any, TimeStep]:
        raise NotImplementedError
