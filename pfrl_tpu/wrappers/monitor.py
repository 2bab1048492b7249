"""Stats-recording monitor wrapper.

Reference parity: pfrl/wrappers/monitor.py:22-30 — gym's Monitor with
``needs_reset`` support. Without gym in the image, this is a
dependency-free episode-stats recorder writing a CSV the plot tool can
read; when gym is present its Monitor can be layered separately.
"""

import csv
import os
import time

from pfrl_tpu.wrappers.misc import _Wrapper


class Monitor(_Wrapper):
    def __init__(self, env, directory: str):
        super().__init__(env)
        os.makedirs(directory, exist_ok=True)
        self._path = os.path.join(directory, "monitor.csv")
        self._start = time.time()
        self._episode_r = 0.0
        self._episode_len = 0
        with open(self._path, "w", newline="") as f:
            csv.writer(f).writerow(["r", "l", "t"])

    def reset(self):
        self._episode_r = 0.0
        self._episode_len = 0
        return self.env.reset()

    def step(self, action):
        obs, r, done, info = self.env.step(action)
        self._episode_r += r
        self._episode_len += 1
        if done or info.get("needs_reset", False):
            with open(self._path, "a", newline="") as f:
                csv.writer(f).writerow(
                    [
                        round(self._episode_r, 6),
                        self._episode_len,
                        round(time.time() - self._start, 6),
                    ]
                )
        return obs, r, done, info


class Render(_Wrapper):
    """Call env.render() every step (reference: pfrl/wrappers/render.py)."""

    def __init__(self, env, **kwargs):
        super().__init__(env)
        self._kwargs = kwargs

    def reset(self):
        ret = self.env.reset()
        if hasattr(self.env, "render"):
            self.env.render(**self._kwargs)
        return ret

    def step(self, action):
        ret = self.env.step(action)
        if hasattr(self.env, "render"):
            self.env.render(**self._kwargs)
        return ret
