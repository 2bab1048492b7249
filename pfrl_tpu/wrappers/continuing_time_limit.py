"""ContinuingTimeLimit (reference parity: pfrl/wrappers/continuing_time_limit.py:4-41).

Signals time-limit expiry via ``info['needs_reset']`` instead of ``done`` so
agents bootstrap through timeouts.
"""

from pfrl_tpu.env import Env


class ContinuingTimeLimit(Env):
    def __init__(self, env, max_episode_steps: int):
        self.env = env
        self._max_episode_steps = max_episode_steps
        self._elapsed_steps = None
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    def step(self, action):
        assert self._elapsed_steps is not None, "Call reset before step"
        obs, reward, done, info = self.env.step(action)
        self._elapsed_steps += 1
        if self._elapsed_steps >= self._max_episode_steps:
            info["needs_reset"] = True
        return obs, reward, done, info

    def reset(self):
        self._elapsed_steps = 0
        return self.env.reset()

    def close(self):
        self.env.close()

    def __getattr__(self, name):
        return getattr(self.env, name)
