"""Vector-env-side frame stacking (reference parity: pfrl/wrappers/vector_frame_stack.py).

Stacks on the vector-env side so per-env subprocesses ship single frames,
not stacks (the reference's rationale, vector_frame_stack.py:66-71). Uses
the same LazyFrames trick for host memory; the device-side Atari path
instead stores single frames in the replay ring and gathers stacks by index
(see pfrl_tpu/replay).
"""

from collections import deque

import numpy as np

from pfrl_tpu.env import VectorEnv


class LazyFrames:
    """Hold references to frames; concatenate only when materialized
    (reference: pfrl/wrappers/atari_wrappers.py:251-272)."""

    def __init__(self, frames, stack_axis=0):
        self._frames = list(frames)
        self.stack_axis = stack_axis

    def __array__(self, dtype=None):
        # Concatenate, not stack: WarpFrame emits frames with a singleton
        # channel axis ((84,84,1) hwc / (1,84,84) chw), so k frames join
        # along that axis into (84,84,k) / (k,84,84) — exactly the
        # reference's LazyFrames (pfrl/wrappers/atari_wrappers.py:251-272).
        out = np.concatenate(self._frames, axis=self.stack_axis)
        if dtype is not None:
            out = out.astype(dtype)
        return out


class VectorFrameStack(VectorEnv):
    def __init__(self, env: VectorEnv, k: int, stack_axis: int = 0):
        self.env = env
        self.k = k
        self.stack_axis = stack_axis
        self.frames = [deque([], maxlen=k) for _ in range(env.num_envs)]
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    @property
    def num_envs(self):
        return self.env.num_envs

    def reset(self, mask=None):
        batch_ob = self.env.reset(mask)
        if mask is None:
            mask = np.zeros(self.num_envs, dtype=bool)
        for m, frames, ob in zip(mask, self.frames, batch_ob):
            if not m:
                for _ in range(self.k):
                    frames.append(ob)
        return [
            LazyFrames(list(f), stack_axis=self.stack_axis) for f in self.frames
        ]

    def step(self, actions):
        batch_ob, reward, done, info = self.env.step(actions)
        for frames, ob in zip(self.frames, batch_ob):
            frames.append(ob)
        obs = [
            LazyFrames(list(f), stack_axis=self.stack_axis) for f in self.frames
        ]
        return obs, reward, done, info

    def seed(self, seeds=None):
        return self.env.seed(seeds)

    def close(self):
        self.env.close()
