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

Requests are row-batched: an actor that drives K env lanes submits one
request carrying K observation rows (``submit_batch``), and the server
concatenates rows across requests up to ``n_slots``. Amortizing the
per-request Python work (queue hop, event wait, GIL churn) over K lanes is
what keeps a threads-only host pipeline fast — per-transition overhead
drops by K, while the device still sees one fixed-width batch.
"""

import queue
import threading
from typing import Any, Callable, Optional

import numpy as np


class _Request:
    __slots__ = ("obs", "rows", "training", "event", "actions", "error")

    def __init__(self, obs, rows, training):
        self.obs = obs          # [rows, ...] leaf-batched pytree
        self.rows = rows
        self.training = training
        self.event = threading.Event()
        self.actions = None     # [rows, ...] on completion
        self.error = None


def _nrows(obs) -> int:
    import jax

    leaves = jax.tree.leaves(obs)
    return int(np.asarray(leaves[0]).shape[0])


class BatchedInferenceServer:
    """Micro-batching action server shared by all actor threads.

    Args:
        act_fn: ``act_fn(rng_seed:int, obs[B], t:int, training:bool) ->
            actions[B]`` — typically a closure over the learner agent's
            latest published train_state (see
            DQN.setup_actor_learner_training). Called on the server thread
            only.
        n_slots: max (and padded) batch width in rows — normally the total
            env-lane count (actors x lanes-per-actor).
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
        # EMA of the forward cost. The batch-collection window scales with
        # it: a padded partial batch costs a FULL forward, so waiting up to
        # ~half a forward for stragglers is always cheaper than running
        # one-request batches back to back (which serializes every actor
        # behind n_actors padded forwards).
        self._fwd_ema = 0.0
        # Which training-flag values have already paid their jit compile.
        # The first batch per flag value (and any gross outlier, e.g. a
        # tunnel hiccup) is excluded from the EMA — otherwise a multi-second
        # compile seeds it and every partial batch stalls ~half a compile
        # waiting for stragglers until the 0.9-decay EMA recovers.
        self._compiled_flags = set()

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
            rows = first.rows
            # Micro-batch: collect until the batch is full or the window
            # closes (a mismatched training flag starts the next batch).
            import time as _time

            # The EMA-scaled window is clamped (50 ms, or the configured
            # timeout if larger): a poisoned/volatile forward estimate can
            # never stall a partial batch indefinitely.
            deadline = _time.monotonic() + min(
                max(0.05, self.timeout),
                max(self.timeout, 0.5 * self._fwd_ema),
            )
            while rows < self.n_slots:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    req = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if req.training != first.training or rows + req.rows > self.n_slots:
                    pending.append(req)
                    break
                batch.append(req)
                rows += req.rows
            try:
                t0 = _time.monotonic()
                self._run_batch(batch, rows)
                dt = _time.monotonic() - t0
                if first.training not in self._compiled_flags:
                    # First call per flag value includes jit compilation;
                    # record the flag, discard the sample.
                    self._compiled_flags.add(first.training)
                elif self._fwd_ema and dt > 10.0 * self._fwd_ema:
                    pass  # gross outlier (tunnel hiccup/recompile): discard
                else:
                    self._fwd_ema = dt if not self._fwd_ema else (
                        0.9 * self._fwd_ema + 0.1 * dt
                    )
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

    def _run_batch(self, batch, rows) -> None:
        import jax

        pad = self.n_slots - rows
        parts = [r.obs for r in batch]
        if pad:
            pad_rows = jax.tree.map(
                lambda x: np.broadcast_to(x[:1], (pad,) + x.shape[1:]),
                batch[0].obs,
            )
            parts.append(pad_rows)
        obs = (
            parts[0]
            if len(parts) == 1
            else jax.tree.map(lambda *xs: np.concatenate(xs), *parts)
        )
        self._seed += 1
        actions = np.asarray(
            self.act_fn(self._seed, obs, self.t_fn(), batch[0].training)
        )
        off = 0
        for req in batch:
            req.actions = actions[off : off + req.rows]
            off += req.rows
            req.event.set()

    # ---------------------------------------------------------------- client
    def submit_batch(self, obs, training: bool):
        """Blocking act call for a row-batched observation ``obs[K, ...]``.

        Every leaf must carry the same leading (row) dimension K. Note the
        check only catches multi-leaf mismatches and scalar leaves: a
        SINGLE unbatched ndarray (e.g. one [84,84,4] frame) is
        indistinguishable from 84 rows of [84,4] and will be split as
        such — callers own the batching contract for one-leaf obs.
        """
        import jax

        leaves = [np.asarray(x) for x in jax.tree.leaves(obs)]
        dims = {x.shape[0] if x.ndim else None for x in leaves}
        if len(dims) != 1 or None in dims:
            raise ValueError(
                f"submit_batch requires [K, ...] leaves with one shared "
                f"leading dimension; got leading dims {sorted(map(str, dims))}"
            )
        rows = _nrows(obs)
        if rows > self.n_slots:
            raise ValueError(
                f"request of {rows} rows exceeds the server's batch width "
                f"n_slots={self.n_slots}"
            )
        req = _Request(obs, rows, training)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.actions

    def submit(self, obs, training: bool):
        """Blocking act call for one observation row."""
        import jax

        batched = jax.tree.map(lambda x: np.asarray(x)[None], obs)
        return self.submit_batch(batched, training)[0]
