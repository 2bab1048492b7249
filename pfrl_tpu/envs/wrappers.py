"""Functional wrappers for device envs."""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class TimeLimitState:
    inner: Any
    t: jax.Array


class TimeLimit(JaxEnv):
    """Truncate episodes after ``max_steps`` without marking termination.

    Carries the reference's ContinuingTimeLimit semantics
    (pfrl/wrappers/continuing_time_limit.py:4-41): the agent must bootstrap
    through a time-limit reset, so the flag surfaces as ``truncated``, never
    ``terminated``.
    """

    def __init__(self, env: JaxEnv, max_steps: int = None):
        self.env = env
        self.max_steps = max_steps if max_steps is not None else env.max_episode_steps
        assert self.max_steps is not None
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.max_episode_steps = self.max_steps

    def reset(self, rng: jax.Array) -> Tuple[TimeLimitState, Any]:
        state, obs = self.env.reset(rng)
        return TimeLimitState(inner=state, t=jnp.int32(0)), obs

    def step(self, rng: jax.Array, state: TimeLimitState, action: jax.Array) -> Tuple[TimeLimitState, TimeStep]:
        inner, ts = self.env.step(rng, state.inner, action)
        t = state.t + 1
        truncated = ts.truncated | ((t >= self.max_steps) & ~ts.terminated)
        return (
            TimeLimitState(inner=inner, t=t),
            TimeStep(
                obs=ts.obs,
                reward=ts.reward,
                terminated=ts.terminated,
                truncated=truncated,
            ),
        )


class ScaleReward(JaxEnv):
    """Multiply rewards by a constant (reference: pfrl/wrappers/scale_reward.py)."""

    def __init__(self, env: JaxEnv, scale: float):
        self.env = env
        self.scale = scale
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.max_episode_steps = env.max_episode_steps

    def reset(self, rng):
        return self.env.reset(rng)

    def step(self, rng, state, action):
        state, ts = self.env.step(rng, state, action)
        return state, ts.replace(reward=ts.reward * self.scale)


class CastObservationToFloat32(JaxEnv):
    """reference: pfrl/wrappers/__init__.py CastObservationToFloat32."""

    def __init__(self, env: JaxEnv):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.max_episode_steps = env.max_episode_steps

    def reset(self, rng):
        state, obs = self.env.reset(rng)
        return state, jax.tree.map(lambda x: x.astype(jnp.float32), obs)

    def step(self, rng, state, action):
        state, ts = self.env.step(rng, state, action)
        return state, ts.replace(
            obs=jax.tree.map(lambda x: x.astype(jnp.float32), ts.obs)
        )


class NormalizeActionSpace(JaxEnv):
    """Present a [-1, 1] action space, rescaling to the inner env's bounds.

    Device-env counterpart of the reference's NormalizeActionSpace
    (pfrl/wrappers/normalize_action_space.py) — squashed policies emit in
    (-1, 1); the wrapper maps affinely onto [low, high].
    """

    def __init__(self, env: JaxEnv):
        from pfrl_tpu import spaces

        self.env = env
        self.observation_space = env.observation_space
        inner = env.action_space
        self._low = jnp.asarray(inner.low, jnp.float32)
        self._high = jnp.asarray(inner.high, jnp.float32)
        self.action_space = spaces.box(-1.0, 1.0, inner.shape)
        self.max_episode_steps = getattr(env, "max_episode_steps", None)

    def reset(self, rng):
        return self.env.reset(rng)

    def step(self, rng, state, action):
        a = jnp.clip(action, -1.0, 1.0)
        scaled = self._low + (a + 1.0) * 0.5 * (self._high - self._low)
        return self.env.step(rng, state, scaled)
