"""Continuous MountainCar as a pure-JAX device env (sparse-reward testbed)."""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class MCState:
    pos: jax.Array
    vel: jax.Array


class MountainCarContinuous(JaxEnv):
    min_pos = -1.2
    max_pos = 0.6
    max_speed = 0.07
    goal_pos = 0.45
    power = 0.0015
    max_episode_steps = 999

    def __init__(self):
        self.observation_space = spaces.Box(
            low=jnp.array([self.min_pos, -self.max_speed], dtype=jnp.float32),
            high=jnp.array([self.max_pos, self.max_speed], dtype=jnp.float32),
        )
        self.action_space = spaces.box(-1.0, 1.0, (1,))

    def _obs(self, s: MCState) -> jax.Array:
        return jnp.stack([s.pos, s.vel]).astype(jnp.float32)

    def reset(self, rng: jax.Array) -> Tuple[MCState, jax.Array]:
        pos = jax.random.uniform(rng, (), jnp.float32, -0.6, -0.4)
        s = MCState(pos=pos, vel=jnp.float32(0.0))
        return s, self._obs(s)

    def step(self, rng: jax.Array, state: MCState, action: jax.Array) -> Tuple[MCState, TimeStep]:
        del rng
        force = jnp.clip(action[0], -1.0, 1.0)
        vel = state.vel + force * self.power - 0.0025 * jnp.cos(3 * state.pos)
        vel = jnp.clip(vel, -self.max_speed, self.max_speed)
        pos = jnp.clip(state.pos + vel, self.min_pos, self.max_pos)
        vel = jnp.where((pos == self.min_pos) & (vel < 0), 0.0, vel)
        terminated = pos >= self.goal_pos
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        s = MCState(pos=pos, vel=vel)
        ts = TimeStep(
            obs=self._obs(s),
            reward=reward.astype(jnp.float32),
            terminated=terminated,
            truncated=jnp.zeros((), bool),
        )
        return s, ts
