"""DQN — functional core + host shell.

Reference parity: pfrl/agents/dqn.py:146-819. The reference's object graph
(model on GPU, replay on host, python act/observe callbacks, poller/learner
threads) collapses into:

- :class:`DQNCore` — pure jitted functions over :class:`DQNState`:
  ``init``, ``select_action``, ``update`` (sample -> TD loss -> optax step ->
  PER feedback in ONE compiled program), ``sync_target``.
- :class:`DQN` — the host shell speaking the reference's
  ``batch_act/batch_observe/save/load`` protocol, with the ReplayUpdater
  gating (pfrl/replay_buffer.py:290-356) as plain host counters.

The async actor-learner mode (dqn.py:604-788) has two TPU-native forms:

- pure-jax envs: the fully-jitted runner looping act+update on device
  (pfrl_tpu/experiments/runner.py) — actor/learner decoupling dissolves.
- host envs (ALE, MuJoCo): :meth:`DQN.setup_actor_learner_training` —
  actor threads step envs and act through ONE batched inference server
  (pfrl_tpu/parallel/inference_server.py), a poller drains their
  transitions into the device replay ring, and a learner thread runs
  updates flat-out, mirroring dqn.py:604-788 with queues instead of pipes
  and a zero-copy snapshot swap instead of the reference's D2H
  state_dict copy.
"""

import collections
import queue as queue_mod
import threading
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from pfrl_tpu.agent import AttributeSavingMixin, BatchAgent
from pfrl_tpu.ops.value_loss import compute_weighted_value_loss
from pfrl_tpu.replay.transition import Transition, TransitionBatch
from pfrl_tpu.utils.copy_param import soft_copy_param
from pfrl_tpu.utils.precision import cast_floating, cast_to_float32
from pfrl_tpu.utils.stats import RunningStats


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    n_updates: jax.Array


def _identity(x):
    return x


def _collate_obs(batch_obs):
    """Collate driver observations into a (possibly pytree) numpy batch.

    The reference supports structured observations through
    ``batch_states``'s recursive stacking (pfrl/utils/batch_states.py:18-36);
    here a python list of pytree observations (e.g. the grasping example's
    ``(image, elapsed_steps)`` tuples) stacks leaf-wise, while plain arrays
    pass through untouched.
    """
    if isinstance(batch_obs, (np.ndarray, jax.Array)):
        return np.asarray(batch_obs)
    if (
        isinstance(batch_obs, (list, tuple))
        and len(batch_obs) > 0
        and isinstance(batch_obs[0], (tuple, list, dict))
    ):
        return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                            *batch_obs)
    return np.asarray(batch_obs)


def _to_device(obs):
    """Host pytree -> device pytree (single transfer per leaf)."""
    return jax.tree.map(jnp.asarray, obs)


class DQNCore:
    """Pure DQN algorithm core.

    Everything the update needs is static config here; everything that
    changes is in DQNState / the replay state. Subclasses override the
    target computation hooks to yield the whole DQN family (DoubleDQN, AL,
    PAL, DPP, distributional variants) exactly as the reference does with
    ``_compute_y_and_t`` overrides.
    """

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        explorer,
        gamma: float = 0.99,
        clip_delta: bool = True,
        batch_accumulator: str = "mean",
        target_update_method: str = "hard",
        soft_update_tau: float = 1e-2,
        phi: Callable = _identity,
        compute_dtype: Optional[Any] = None,
    ):
        self.model = model
        self.optimizer = optimizer
        self.explorer = explorer
        self.gamma = gamma
        self.clip_delta = clip_delta
        self.batch_accumulator = batch_accumulator
        self.target_update_method = target_update_method
        self.soft_update_tau = soft_update_tau
        self.phi = phi
        # Mixed precision (TPU-native; no reference counterpart): with
        # compute_dtype=jnp.bfloat16 the network forward/backward runs in
        # bf16 (params + activations cast at the apply boundary) while
        # params, optimizer state, Q-values, and TD/loss math stay fp32.
        self.compute_dtype = compute_dtype

    # ----------------------------------------------------------------- setup
    def _model_init_args(self, x):
        return (x,)

    def init(self, rng: jax.Array, example_obs, example_action=None) -> DQNState:
        """``example_obs`` is a batched observation (leading batch dim).

        ``example_action`` is part of the uniform core protocol (needed by
        actor-critic cores to init critics); unused here.
        """
        del example_action
        rng_p, rng_n = jax.random.split(rng)
        x = self.phi(example_obs)
        params = self.model.init(
            {"params": rng_p, "noise": rng_n}, *self._model_init_args(x)
        )
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def action_value(self, params, rng: jax.Array, obs):
        av = self.model.apply(
            cast_floating(params, self.compute_dtype),
            cast_floating(self.phi(obs), self.compute_dtype),
            rngs={"noise": rng},
        )
        # Q-values come back to fp32 so greedy/TD/loss math is full
        # precision regardless of the compute dtype.
        return cast_to_float32(av) if self.compute_dtype is not None else av

    def select_action(
        self, state: DQNState, rng: jax.Array, obs, t: jax.Array, training: bool
    ) -> jax.Array:
        rng_noise, rng_explore = jax.random.split(rng)
        av = self.action_value(state.params, rng_noise, obs)
        greedy = av.greedy_actions()
        if not training:
            return greedy
        return self.explorer.select_action(rng_explore, t, greedy, av)

    # ---------------------------------------------------------------- update
    def compute_y_and_t(self, params, target_params, rng, batch: TransitionBatch):
        """Predictions and targets (reference: dqn.py:388-470)."""
        rng_on, rng_tgt = jax.random.split(rng)
        av = self.action_value(params, rng_on, batch.obs)
        y = av.evaluate_actions(batch.action)
        next_av = self.action_value(target_params, rng_tgt, batch.next_obs)
        max_next_q = next_av.max()
        t = batch.reward + batch.discount * (
            1.0 - batch.is_terminal.astype(jnp.float32)
        ) * jax.lax.stop_gradient(max_next_q)
        return y, jax.lax.stop_gradient(t)

    def loss_and_errors(self, params, target_params, rng, batch: TransitionBatch):
        y, t = self.compute_y_and_t(params, target_params, rng, batch)
        loss = compute_weighted_value_loss(
            y,
            t,
            batch.weight,
            clip_delta=self.clip_delta,
            batch_accumulator=self.batch_accumulator,
        )
        return loss, (jnp.abs(y - t), jnp.mean(y))

    def update(self, state: DQNState, rng: jax.Array, batch: TransitionBatch):
        """One gradient step. Returns (state, aux) with per-sample errors."""
        (loss, (errors, q_mean)), grads = jax.value_and_grad(
            self.loss_and_errors, has_aux=True
        )(state.params, state.target_params, rng, batch)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, n_updates=state.n_updates + 1
        )
        aux = {
            "loss": loss,
            "average_q": q_mean,
            "errors": jax.lax.stop_gradient(errors),
        }
        return new_state, aux

    def sync_target(self, state: DQNState) -> DQNState:
        """Hard/soft target sync (dqn.py:307-314)."""
        if self.target_update_method == "hard":
            return state.replace(target_params=state.params)
        return state.replace(
            target_params=soft_copy_param(
                state.target_params, state.params, self.soft_update_tau
            )
        )


class DQN(AttributeSavingMixin, BatchAgent):
    """Host shell with the reference's agent protocol (dqn.py:146-560)."""

    saved_attributes = ("train_state",)

    def __init__(
        self,
        q_function,
        optimizer: optax.GradientTransformation,
        replay_buffer,
        gamma: float,
        explorer,
        *,
        replay_start_size: int = 50000,
        minibatch_size: int = 32,
        update_interval: int = 1,
        target_update_interval: int = 10000,
        clip_delta: bool = True,
        phi: Callable = _identity,
        target_update_method: str = "hard",
        soft_update_tau: float = 1e-2,
        n_times_update: int = 1,
        batch_accumulator: str = "mean",
        seed: int = 0,
        core_cls: Optional[type] = None,
        compute_dtype: Optional[Any] = None,
    ):
        core_cls = core_cls or type(self).default_core
        self.core = core_cls(
            model=q_function,
            optimizer=optimizer,
            explorer=explorer,
            gamma=gamma,
            clip_delta=clip_delta,
            batch_accumulator=batch_accumulator,
            target_update_method=target_update_method,
            soft_update_tau=soft_update_tau,
            phi=phi,
            compute_dtype=compute_dtype,
        )
        self.buffer = replay_buffer
        self.gamma = gamma
        self.replay_start_size = replay_start_size
        self.minibatch_size = minibatch_size
        self.update_interval = update_interval
        self.target_update_interval = target_update_interval
        self.n_times_update = n_times_update

        self.rng = jax.random.PRNGKey(seed)
        self.t = 0  # env transitions observed
        self._optim_t = 0  # optimizer steps (host mirror of n_updates)
        self.train_state: Optional[DQNState] = None
        self.replay_state = None
        self._last_obs = None
        self._last_action = None
        self._loss_stats = RunningStats(100)
        self._q_stats = RunningStats(1000)
        self._jit_act = None
        self._jit_update = None

    # --------------------------------------------------------------- helpers
    def _next_rng(self) -> jax.Array:
        self.rng, out = jax.random.split(self.rng)
        return out

    def _ensure_init(self, batch_obs) -> None:
        if self.train_state is None:
            self.train_state = self.core.init(self._next_rng(), _to_device(batch_obs))
            self._restore_pending()
        if self._jit_act is None:
            self._jit_act = jax.jit(
                self.core.select_action, static_argnames=("training",)
            )

    def _ensure_buffer(self, example: Transition) -> None:
        if self.replay_state is None:
            self.replay_state = self.buffer.init(example)
            core, buffer = self.core, self.buffer

            def fused_update(train_state, replay_state, rng):
                rng_s, rng_u = jax.random.split(rng)
                out = buffer.sample(replay_state, rng_s, self.minibatch_size)
                if isinstance(out, tuple):
                    batch, replay_state = out
                else:
                    batch = out
                train_state, aux = core.update(train_state, rng_u, batch)
                replay_state = buffer.update_priorities(
                    replay_state, batch.indices, aux["errors"]
                )
                return train_state, replay_state, aux["loss"], aux["average_q"]

            self._jit_update = jax.jit(fused_update)

    # ------------------------------------------------------------------- act
    def batch_act(self, batch_obs):
        batch_obs = _collate_obs(batch_obs)
        self._ensure_init(batch_obs)
        actions = self._jit_act(
            self.train_state,
            self._next_rng(),
            _to_device(batch_obs),
            jnp.asarray(self.t, jnp.int32),
            self.training,
        )
        if self.training:
            self._last_obs = batch_obs
            self._last_action = np.asarray(actions)
        return np.asarray(actions)

    # --------------------------------------------------------------- observe
    def batch_observe(self, batch_obs, batch_reward, batch_done, batch_reset):
        if not self.training:
            return
        batch_obs = _collate_obs(batch_obs)
        done = np.asarray(batch_done, dtype=bool)
        b = done.shape[0]
        reset = np.asarray(batch_reset, dtype=bool)
        transition = Transition(
            obs=_to_device(self._last_obs),
            action=jnp.asarray(self._last_action),
            reward=jnp.asarray(batch_reward, jnp.float32),
            next_obs=_to_device(batch_obs),
            terminated=jnp.asarray(done),
            done=jnp.asarray(done | reset),
            extras=FrozenDict(),
        )
        if self.replay_state is None:
            example = jax.tree.map(lambda x: x[0], transition)
            if getattr(self.buffer, "num_lanes", 1) != b:
                self.buffer = self.buffer.configure_lanes(b)
            self._ensure_buffer(example)
        self.replay_state = self.buffer.add(self.replay_state, transition)

        prev_t = self.t
        self.t += b
        # Target sync on crossing each multiple (dqn.py:520-521).
        if prev_t // self.target_update_interval != self.t // self.target_update_interval:
            self.train_state = self.core.sync_target(self.train_state)
        # ReplayUpdater gating (pfrl/replay_buffer.py:290-356).
        if self.t >= self.replay_start_size:
            n_triggers = (
                self.t // self.update_interval - prev_t // self.update_interval
            )
            for _ in range(n_triggers * self.n_times_update):
                self._update_once()

    def _update_once(self):
        (
            self.train_state,
            self.replay_state,
            loss,
            avg_q,
        ) = self._jit_update(self.train_state, self.replay_state, self._next_rng())
        self._optim_t += 1
        self._loss_stats.append(loss)
        self._q_stats.append(avg_q)

    # ----------------------------------------------------------------- stats
    def get_statistics(self):
        return [
            ("average_q", self._q_stats.mean()),
            ("average_loss", self._loss_stats.mean()),
            ("n_updates", self.optim_t),
        ]

    # ======================================================== actor-learner
    # TPU-native port of pfrl/agents/dqn.py:604-788 (see module docstring).

    @property
    def cumulative_steps(self) -> int:
        """Total env transitions received from actors (dqn.py:631)."""
        counter = getattr(self, "_cumulative_steps_counter", None)
        return counter.value if counter is not None else self.t

    @property
    def optim_t(self) -> int:
        """Number of optimizer steps so far (host mirror of n_updates)."""
        return self._optim_t

    def _can_start_replay(self) -> bool:
        """dqn.py:594-602: enough experience inserted to sample safely."""
        margin = (self.buffer.num_steps + 1) * self.buffer.num_lanes
        need = max(self.replay_start_size, margin, self.minibatch_size)
        return self._replay_inserted >= need

    def _actor_act_fn(self, seed: int, obs_batch, t: int, training: bool):
        """Server-side batched act: lazy-init, then one device forward using
        the latest published snapshot (never blocks on the learner)."""
        with self._init_lock:
            if self.train_state is None or self._jit_act is None:
                self._ensure_init(jax.tree.map(np.asarray, obs_batch))
                self._initialized_event.set()
        train_state = (
            self._actor_train_state
            if self._actor_train_state is not None
            else self.train_state
        )
        return self._jit_act(
            train_state,
            jax.random.PRNGKey(seed),
            _to_device(obs_batch),
            jnp.asarray(t, jnp.int32),
            training,
        )

    def _poller_loop(self, transition_queue, stop_event, exception_event, logger):
        """Drain actor transitions into the device replay ring.

        Parity: dqn.py:604-646 + 713-727. The ring interleaves lanes
        (lane = actor), so transitions stage in per-actor FIFOs and flush one
        full row (one transition per actor) at a time — preserving each
        lane's temporal order for the n-step fold exactly as the reference's
        per-env_id staging deques do (replay_buffers/replay_buffer.py:29-62).
        """
        n = self._n_actors
        k = self._lanes_per_actor
        total = n * k
        staging = [collections.deque() for _ in range(n)]
        try:
            while not stop_event.is_set() and not exception_event.is_set():
                try:
                    actor_id, data = transition_queue.get(timeout=0.05)
                except queue_mod.Empty:
                    continue
                staging[actor_id].append(data)
                self._cumulative_steps_counter.increment(k)
                # Opportunistically drain everything already in flight.
                while True:
                    try:
                        actor_id, data = transition_queue.get_nowait()
                    except queue_mod.Empty:
                        break
                    staging[actor_id].append(data)
                    self._cumulative_steps_counter.increment(k)
                while all(staging):
                    rows = [staging[i].popleft() for i in range(n)]
                    if k == 1:
                        # Single-lane actors ship unbatched rows: stack.
                        cat = lambda *xs: jnp.asarray(
                            np.stack([np.asarray(x) for x in xs])
                        )
                    else:
                        # Vector actors ship [k, ...] rows: concatenate.
                        cat = lambda *xs: jnp.asarray(
                            np.concatenate([np.asarray(x) for x in xs])
                        )
                    # A ring with wants_next_obs=False derives the bootstrap
                    # obs from the successor row and discards next_obs at
                    # add() (replay/uniform.py:205-208) — skip its
                    # concatenation AND its device upload entirely here
                    # (halves the poller's H2D volume for image obs).
                    if self.buffer.wants_next_obs:
                        next_obs = jax.tree.map(
                            cat, *[r["next_obs"] for r in rows]
                        )
                    else:
                        next_obs = jax.tree.map(
                            lambda x: jnp.zeros((total, 0)),
                            rows[0]["next_obs"],
                        )
                    transition = Transition(
                        obs=jax.tree.map(cat, *[r["obs"] for r in rows]),
                        action=jnp.asarray(cat(*[r["action"] for r in rows])),
                        reward=jnp.asarray(cat(*[r["reward"] for r in rows])),
                        next_obs=next_obs,
                        terminated=jnp.asarray(
                            cat(*[r["terminated"] for r in rows])
                        ),
                        done=jnp.asarray(cat(*[r["done"] for r in rows])),
                        extras=FrozenDict(),
                    )
                    with self._replay_lock:
                        if self.replay_state is None:
                            example = jax.tree.map(lambda x: x[0], transition)
                            if self.buffer.num_lanes != total:
                                self.buffer = self.buffer.configure_lanes(total)
                            self._ensure_buffer(example)
                        self.replay_state = self.buffer.add(
                            self.replay_state, transition
                        )
                        self._replay_inserted += total
        except Exception:
            logger.exception("Poller loop failed. Exiting")
            exception_event.set()
        finally:
            self._inference.stop()

    def _learner_loop(
        self,
        stop_event,
        exception_event,
        n_updates,
        actor_update_interval,
        step_hooks,
        optimizer_step_hooks,
        logger,
    ):
        """Optimizer steps decoupled from env stepping (dqn.py:648-712)."""
        try:
            update_counter = 0
            while not stop_event.is_set():
                if (
                    self.train_state is None
                    or self.replay_state is None
                    or not self._can_start_replay()
                ):
                    # 5ms, not sub-ms: a tight poll here would grab the GIL
                    # thousands of times per second against the actor threads.
                    time.sleep(5e-3)
                    continue
                if n_updates is not None and self._optim_t >= n_updates:
                    stop_event.set()
                    break
                with self._replay_lock:
                    self._update_once()
                update_counter += 1
                # Publish the actors' snapshot: a pointer swap — device
                # arrays are immutable, so no copy (vs the reference's
                # state_dict D2H copy, dqn.py:687-691).
                if update_counter % actor_update_interval == 0:
                    self.update_counter.increment()
                    self._actor_train_state = self.train_state
                # Effective timestep keeps the configured update:env-step
                # ratio for target syncs and hooks (dqn.py:693-712).
                effective_timestep = self._optim_t * self.update_interval
                self.t = effective_timestep
                for hook in optimizer_step_hooks:
                    hook(None, self, self._optim_t)
                for hook in step_hooks:
                    hook(None, self, effective_timestep)
                if effective_timestep % self.target_update_interval == 0:
                    self.train_state = self.core.sync_target(self.train_state)
        except Exception:
            logger.exception("Learner loop failed. Exiting")
            exception_event.set()

    def setup_actor_learner_training(
        self,
        n_actors: int,
        update_counter=None,
        n_updates: Optional[int] = None,
        actor_update_interval: int = 8,
        lanes_per_actor: int = 1,
        inference_slots: Optional[int] = None,
        step_hooks=(),
        optimizer_step_hooks=(),
        logger=None,
    ):
        """Returns ``(make_actor, learner, poller, exception_event)``.

        Same contract as the reference (dqn.py:729-788): start ``poller``
        and ``learner``, build actors with ``make_actor(i)``, drive them
        with ``experiments.train_agent_async(..., make_agent=make_actor,
        stop_event=learner.stop_event)``, then stop/join both threads.

        With ``lanes_per_actor=K > 1`` each ``make_actor(i)`` returns a
        VectorStateQFunctionActor driving K env lanes from one thread
        (drive with batch_act/batch_observe over K envs); the replay ring
        gets ``n_actors * K`` lanes. This is how a threads-only host
        pipeline reaches device-act rates: per-transition queue/event/GIL
        overhead is amortized K-fold (see state_q_function_actor.py).

        ``inference_slots`` sets the act-batch width (default: all lanes).
        Setting it to HALF the total lanes double-buffers the device: one
        actor group's forward runs while the other group steps its envs,
        hiding per-call device latency behind env stepping — the win is
        large when that latency is high (remote/tunneled TPU).
        """
        import logging as _logging

        from pfrl_tpu.agents.state_q_function_actor import (
            StateQFunctionActor,
            VectorStateQFunctionActor,
        )
        from pfrl_tpu.parallel.inference_server import BatchedInferenceServer
        from pfrl_tpu.utils.stoppable_thread import Counter, StoppableThread

        logger = logger or _logging.getLogger(__name__)
        self._n_actors = n_actors
        self._lanes_per_actor = lanes_per_actor
        self.update_counter = (
            update_counter if update_counter is not None else Counter()
        )
        self._cumulative_steps_counter = Counter()
        self._replay_inserted = 0
        self._optim_t = 0
        self._actor_train_state = None
        self._replay_lock = threading.Lock()
        self._init_lock = threading.Lock()
        self._initialized_event = threading.Event()

        self._inference = BatchedInferenceServer(
            act_fn=self._actor_act_fn,
            n_slots=inference_slots or n_actors * lanes_per_actor,
            t_fn=lambda: self._cumulative_steps_counter.value,
        )
        self._inference.start()
        transition_queue: "queue_mod.Queue" = queue_mod.Queue()
        exception_event = threading.Event()

        def make_actor(i: int) -> StateQFunctionActor:
            if lanes_per_actor > 1:
                return VectorStateQFunctionActor(
                    inference=self._inference,
                    transition_queue=transition_queue,
                    actor_id=i,
                    num_lanes=lanes_per_actor,
                    learner_agent=self,
                    logger=logger,
                )
            return StateQFunctionActor(
                inference=self._inference,
                transition_queue=transition_queue,
                actor_id=i,
                learner_agent=self,
                logger=logger,
            )

        poller_stop = threading.Event()
        poller = StoppableThread(
            stop_event=poller_stop,
            target=self._poller_loop,
            kwargs=dict(
                transition_queue=transition_queue,
                stop_event=poller_stop,
                exception_event=exception_event,
                logger=logger,
            ),
        )
        learner_stop = threading.Event()
        learner = StoppableThread(
            stop_event=learner_stop,
            target=self._learner_loop,
            kwargs=dict(
                stop_event=learner_stop,
                exception_event=exception_event,
                n_updates=n_updates,
                actor_update_interval=actor_update_interval,
                step_hooks=list(step_hooks),
                optimizer_step_hooks=list(optimizer_step_hooks),
                logger=logger,
            ),
        )
        return make_actor, learner, poller, exception_event


DQN.default_core = DQNCore
