"""Host-side rolling statistics for Agent.get_statistics().

Replaces the reference's collections.deque windows (e.g. pfrl/agents/dqn.py:259-263)
with a tiny numpy ring so stats never force device sync beyond the scalars the
update step already returned.
"""

import numpy as np


class RunningStats:
    """Fixed-window running mean of scalar series."""

    def __init__(self, maxlen: int = 100):
        self.maxlen = maxlen
        self._buf = np.zeros(maxlen, dtype=np.float64)
        self._n = 0
        self._i = 0

    def append(self, x) -> None:
        x = float(x)
        if np.isnan(x):
            return
        self._buf[self._i] = x
        self._i = (self._i + 1) % self.maxlen
        self._n = min(self._n + 1, self.maxlen)

    def mean(self) -> float:
        if self._n == 0:
            return float("nan")
        return float(self._buf[: self._n].mean())

    def __len__(self) -> int:
        return self._n
