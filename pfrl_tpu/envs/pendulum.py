"""Pendulum-v1 dynamics as a pure-JAX device env (continuous control).

Torque-limited pendulum swing-up; obs = (cos th, sin th, thdot), reward =
-(th^2 + 0.1 thdot^2 + 0.001 u^2). Never terminates; 200-step truncation via
TimeLimit. Used as the MuJoCo-free continuous-control benchmark env.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class PendulumState:
    th: jax.Array
    thdot: jax.Array


def _angle_normalize(x):
    return ((x + math.pi) % (2 * math.pi)) - math.pi


class Pendulum(JaxEnv):
    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0
    max_episode_steps = 200

    def __init__(self):
        high = jnp.array([1.0, 1.0, self.max_speed], dtype=jnp.float32)
        self.observation_space = spaces.Box(low=-high, high=high)
        self.action_space = spaces.box(-self.max_torque, self.max_torque, (1,))

    def _obs(self, s: PendulumState) -> jax.Array:
        return jnp.stack([jnp.cos(s.th), jnp.sin(s.th), s.thdot]).astype(jnp.float32)

    def reset(self, rng: jax.Array) -> Tuple[PendulumState, jax.Array]:
        r1, r2 = jax.random.split(rng)
        th = jax.random.uniform(r1, (), jnp.float32, -math.pi, math.pi)
        thdot = jax.random.uniform(r2, (), jnp.float32, -1.0, 1.0)
        s = PendulumState(th=th, thdot=thdot)
        return s, self._obs(s)

    def step(self, rng: jax.Array, state: PendulumState, action: jax.Array) -> Tuple[PendulumState, TimeStep]:
        del rng
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)
        th, thdot = state.th, state.thdot
        cost = (
            _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        )
        newthdot = thdot + (
            3.0 * self.g / (2.0 * self.length) * jnp.sin(th)
            + 3.0 / (self.m * self.length**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        s = PendulumState(th=newth, thdot=newthdot)
        ts = TimeStep(
            obs=self._obs(s),
            reward=-cost.astype(jnp.float32),
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
        )
        return s, ts
