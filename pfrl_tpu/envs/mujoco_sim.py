"""Synthetic MuJoCo-shaped benchmark env (continuous control).

HalfCheetah-like shapes — obs ``[17]`` float32, action ``[6]`` in [-1, 1],
1000-step truncation-only episodes — from cheap fixed-matrix dynamics.
MuJoCo physics is a host-CPU workload in every framework (the reference
drives it through gym subprocesses, pfrl/envs/multiprocess_vector_env.py);
this env exists so the *training loop* — MLP act/update at the real
MuJoCo batch shapes (PPO epochs, SAC twin-critic updates) — can be
benchmarked entirely on device, the same role AtariSim plays for the DQN
anchor. Reward is a forward-progress-minus-control-cost shape so
policy-gradient losses have real signal structure.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class MujocoSimState:
    x: jax.Array   # latent/observed state vector
    t: jax.Array


class MujocoSim(JaxEnv):
    def __init__(
        self,
        obs_dim: int = 17,
        action_dim: int = 6,
        episode_len: int = 1000,
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.episode_len = episode_len
        self.observation_space = spaces.box(-jnp.inf, jnp.inf, (obs_dim,))
        self.action_space = spaces.box(-1.0, 1.0, (action_dim,))
        # Fixed random mixing matrices (deterministic; closed over by jit).
        ka, kb = jax.random.split(jax.random.PRNGKey(17))
        self._A = jax.random.normal(ka, (obs_dim, obs_dim)) * (0.9 / obs_dim**0.5)
        self._B = jax.random.normal(kb, (action_dim, obs_dim)) * 0.4

    def reset(self, rng: jax.Array) -> Tuple[MujocoSimState, jax.Array]:
        x = 0.1 * jax.random.normal(rng, (self.obs_dim,), jnp.float32)
        state = MujocoSimState(x=x, t=jnp.int32(0))
        return state, x

    def step(
        self, rng: jax.Array, state: MujocoSimState, action: jax.Array
    ) -> Tuple[MujocoSimState, TimeStep]:
        del rng
        a = jnp.clip(action, -1.0, 1.0)
        x = jnp.tanh(state.x @ self._A + a @ self._B)
        t = state.t + 1
        # Forward-progress reward minus control cost (HalfCheetah shape).
        reward = x[0] - 0.05 * jnp.sum(a * a)
        new_state = MujocoSimState(x=x, t=t)
        ts = TimeStep(
            obs=x,
            reward=reward.astype(jnp.float32),
            terminated=jnp.zeros((), bool),
            truncated=t >= self.episode_len,
        )
        return new_state, ts
