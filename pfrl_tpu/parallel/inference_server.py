"""Centralized batched inference for host-side actors (SEED-RL style).

The reference's actor-learner mode gives every actor process its own CPU
copy of the model, refreshed by an expensive device-to-host state_dict copy
(pfrl/agents/dqn.py:299-301,687-691). On TPU the right inversion is the
opposite: actors own no parameters at all. They submit observations to one
server thread that stacks them into a fixed-size batch and runs a single
jitted forward on the chip — the MXU sees one batched matmul instead of N
scalar-batch calls, and "refreshing the actors' model" is a free pointer
swap because jax device arrays are immutable (a stale snapshot stays valid
while referenced; no D2H copy ever happens).

Static shapes: the request batch is always padded to ``n_slots`` rows, so
the server compiles exactly once per ``training`` flag value.
"""

import queue
import threading
from typing import Any, Callable, Optional

import numpy as np


class _Request:
    __slots__ = ("obs", "training", "event", "action", "error")

    def __init__(self, obs, training):
        self.obs = obs
        self.training = training
        self.event = threading.Event()
        self.action = None
        self.error = None


class BatchedInferenceServer:
    """Micro-batching action server shared by all actor threads.

    Args:
        act_fn: ``act_fn(rng_seed:int, obs[B], t:int, training:bool) ->
            actions[B]`` — typically a closure over the learner agent's
            latest published train_state (see
            DQN.setup_actor_learner_training). Called on the server thread
            only.
        n_slots: max (and padded) batch width — normally the actor count.
        t_fn: returns the global env-step counter fed to the explorer
            schedule (the reference actor passes its own ``t``,
            pfrl/agents/state_q_function_actor.py:80-88).
    """

    def __init__(
        self,
        act_fn: Callable[..., Any],
        n_slots: int,
        t_fn: Callable[[], int] = lambda: 0,
        timeout: float = 0.002,
    ):
        self.act_fn = act_fn
        self.n_slots = n_slots
        self.t_fn = t_fn
        self.timeout = timeout
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._seed = 0
        self._thread: Optional[threading.Thread] = None

    # ---------------------------------------------------------------- server
    def start(self) -> None:
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()

    def _serve(self) -> None:
        pending: list[_Request] = []
        while not self._stop.is_set():
            try:
                first = pending.pop(0) if pending else self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline_passed = False
            # Micro-batch: drain whatever else is in flight (same training
            # flag — a mismatched request starts the next batch).
            while len(batch) < self.n_slots and not deadline_passed:
                try:
                    req = self._queue.get(timeout=self.timeout)
                except queue.Empty:
                    deadline_passed = True
                    continue
                if req.training != first.training:
                    pending.append(req)
                    break
                batch.append(req)
            try:
                self._run_batch(batch)
            except Exception as e:  # propagate to all waiting actors
                for req in batch:
                    req.error = e
                    req.event.set()
        # Unblock anything still queued after stop.
        leftovers = pending
        while True:
            try:
                leftovers.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for req in leftovers:
            req.error = RuntimeError("inference server stopped")
            req.event.set()

    def _run_batch(self, batch) -> None:
        n = len(batch)
        obs = np.stack(
            [np.asarray(r.obs) for r in batch]
            + [np.asarray(batch[0].obs)] * (self.n_slots - n)
        )
        self._seed += 1
        actions = np.asarray(
            self.act_fn(self._seed, obs, self.t_fn(), batch[0].training)
        )
        for i, req in enumerate(batch):
            req.action = actions[i]
            req.event.set()

    # ---------------------------------------------------------------- client
    def submit(self, obs, training: bool):
        """Blocking act call from an actor thread."""
        req = _Request(obs, training)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.action
