"""CartPole-v1 dynamics as a pure-JAX device env.

Classic Barto-Sutton-Anderson cart-pole as used by the reference's gym
examples (examples/gym/train_dqn_gym.py). Euler integration at dt=0.02,
reward +1 per step, termination at |x|>2.4 or |theta|>12deg; the 500-step
limit comes from wrapping in :class:`pfrl_tpu.envs.wrappers.TimeLimit`.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class CartPoleState:
    x: jax.Array  # [4]: cart pos, cart vel, pole angle, pole angular vel


class CartPole(JaxEnv):
    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    length = 0.5  # half pole length
    force_mag = 10.0
    dt = 0.02
    theta_threshold = 12 * 2 * math.pi / 360
    x_threshold = 2.4
    max_episode_steps = 500

    def __init__(self):
        high = jnp.array([4.8, 1e4, 0.418, 1e4], dtype=jnp.float32)
        self.observation_space = spaces.Box(low=-high, high=high)
        self.action_space = spaces.Discrete(2)

    def reset(self, rng: jax.Array) -> Tuple[CartPoleState, jax.Array]:
        x = jax.random.uniform(rng, (4,), jnp.float32, -0.05, 0.05)
        return CartPoleState(x=x), x

    def step(self, rng: jax.Array, state: CartPoleState, action: jax.Array) -> Tuple[CartPoleState, TimeStep]:
        del rng
        x, x_dot, theta, theta_dot = state.x[0], state.x[1], state.x[2], state.x[3]
        force = jnp.where(action.astype(jnp.int32) == 1, self.force_mag, -self.force_mag)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length
        temp = (force + polemass_length * theta_dot**2 * sintheta) / total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass
        x = x + self.dt * x_dot
        x_dot = x_dot + self.dt * xacc
        theta = theta + self.dt * theta_dot
        theta_dot = theta_dot + self.dt * thetaacc
        obs = jnp.stack([x, x_dot, theta, theta_dot]).astype(jnp.float32)
        terminated = (
            (jnp.abs(x) > self.x_threshold) | (jnp.abs(theta) > self.theta_threshold)
        )
        ts = TimeStep(
            obs=obs,
            reward=jnp.float32(1.0),
            terminated=terminated,
            truncated=jnp.zeros((), bool),
        )
        return CartPoleState(x=obs), ts
