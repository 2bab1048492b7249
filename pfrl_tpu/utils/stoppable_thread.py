"""Thread with a stop event (reference parity: pfrl/utils/stoppable_thread.py).

Used by the actor-learner runtime (pfrl_tpu/experiments/actor_learner.py)
for the learner/poller loops, exactly as the reference uses it for
DQN.setup_actor_learner_training (pfrl/agents/dqn.py:760-786).
"""

import threading


class StoppableThread(threading.Thread):
    """Thread carrying an event object that asks it to stop.

    Args:
        stop_event: ``threading.Event`` polled by the thread's target; the
            thread's loop should exit when it is set.
    """

    def __init__(self, stop_event: threading.Event, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.stop_event = stop_event

    def stop(self) -> None:
        self.stop_event.set()

    def is_stopped(self) -> bool:
        return self.stop_event.is_set()


class Counter:
    """Thread-shared monotonic counter.

    Replaces the reference's ``mp.Value`` global step counter
    (pfrl/experiments/train_agent_async.py:225): actors here are threads of
    one process (they share the TPU through the batched inference server),
    so a lock-guarded int suffices.
    """

    def __init__(self, value: int = 0):
        self._value = value
        self._lock = threading.Lock()

    def increment(self, n: int = 1) -> int:
        """Add ``n`` and return the new value."""
        with self._lock:
            self._value += n
            return self._value

    @property
    def value(self) -> int:
        with self._lock:
            return self._value
