"""Synthetic Atari-shaped benchmark env.

Produces 84x84x4 uint8 observations (the DeepMind-preprocessed Atari shape,
reference: pfrl/wrappers/atari_wrappers.py WarpFrame+FrameStack) from a
cheap procedural pattern, with episode statistics resembling Atari
(geometric episode lengths, clipped rewards). Real Atari emulation is a
host-side CPU workload in any framework; this env exists so the *training
loop* — Nature-CNN act/update, uint8 frame replay, target sync — can be
benchmarked at the real workload's shapes entirely on device.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu import spaces
from pfrl_tpu.env import JaxEnv, TimeStep


@struct.dataclass
class AtariSimState:
    t: jax.Array      # step within episode
    seed: jax.Array   # per-episode pattern seed
    ep_len: jax.Array # sampled episode length


class AtariSim(JaxEnv):
    def __init__(
        self,
        n_actions: int = 6,
        mean_episode_len: int = 1000,
        frame_shape: Tuple[int, int, int] = (84, 84, 4),
    ):
        self.n_actions = n_actions
        self.mean_episode_len = mean_episode_len
        self.frame_shape = frame_shape
        self.observation_space = spaces.box(0, 255, frame_shape)
        self.action_space = spaces.Discrete(n_actions)

    def _obs(self, state: AtariSimState) -> jax.Array:
        h, w, c = self.frame_shape
        rows = jax.lax.broadcasted_iota(jnp.int32, self.frame_shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, self.frame_shape, 1)
        chans = jax.lax.broadcasted_iota(jnp.int32, self.frame_shape, 2)
        mix = rows * 31 + cols * 17 + chans * 97 + state.t * 13 + state.seed * 7919
        return (mix & 0xFF).astype(jnp.uint8)

    def reset(self, rng: jax.Array) -> Tuple[AtariSimState, jax.Array]:
        r1, r2 = jax.random.split(rng)
        seed = jax.random.randint(r1, (), 0, 1 << 20)
        u = jax.random.uniform(r2, ())
        ep_len = (1.0 + -jnp.log1p(-u) * self.mean_episode_len).astype(jnp.int32)
        state = AtariSimState(t=jnp.int32(0), seed=seed, ep_len=ep_len)
        return state, self._obs(state)

    def step(self, rng: jax.Array, state: AtariSimState, action: jax.Array) -> Tuple[AtariSimState, TimeStep]:
        t = state.t + 1
        new_state = AtariSimState(t=t, seed=state.seed, ep_len=state.ep_len)
        # Sparse clipped reward, weakly action-dependent so Q-learning has
        # something to fit (throughput is unaffected either way).
        lucky = ((state.seed + t) % 37) == (action.astype(jnp.int32) % 37 % 7)
        reward = jnp.where(lucky, 1.0, 0.0).astype(jnp.float32)
        terminated = t >= state.ep_len
        ts = TimeStep(
            obs=self._obs(new_state),
            reward=reward,
            terminated=terminated,
            truncated=jnp.zeros((), bool),
        )
        return new_state, ts
