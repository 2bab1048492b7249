"""Profiling helpers (reference parity: pfrl's cProfile hook,
train_agent_async.py:308-315, upgraded to device-level tracing).

- :func:`trace` wraps a block in the jax profiler, producing a TensorBoard-
  loadable trace of the fused device programs.
- :class:`StepTimer` measures steady-state throughput with
  ``block_until_ready`` fencing (compile excluded by a warmup call).
"""

import contextlib
import time
from typing import Any

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """``with profiling.trace("/tmp/trace"):`` — view in TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._t0 = None
        self._steps = 0

    def start(self, fence: Any = None) -> None:
        if fence is not None:
            jax.block_until_ready(fence)
        self._t0 = time.perf_counter()
        self._steps = 0

    def lap(self, n_steps: int, fence: Any = None) -> float:
        """Record n_steps done; returns steps/sec so far."""
        if fence is not None:
            jax.block_until_ready(fence)
        self._steps += n_steps
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("inf")
