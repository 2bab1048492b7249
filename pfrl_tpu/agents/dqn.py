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

The async actor-learner mode (dqn.py:604-788) is intentionally absent: its
TPU-native replacement is the fully-jitted runner looping act+update on
device (pfrl_tpu/experiments/runner.py), which makes the actor/learner
decoupling unnecessary — see SURVEY.md §7.
"""

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
from pfrl_tpu.utils.stats import RunningStats


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    n_updates: jax.Array


def _identity(x):
    return x


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
        return self.model.apply(params, self.phi(obs), rngs={"noise": rng})

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

    def _ensure_init(self, batch_obs: np.ndarray) -> None:
        if self.train_state is None:
            self.train_state = self.core.init(self._next_rng(), jnp.asarray(batch_obs))
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
        batch_obs = np.asarray(batch_obs)
        self._ensure_init(batch_obs)
        actions = self._jit_act(
            self.train_state,
            self._next_rng(),
            jnp.asarray(batch_obs),
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
        batch_obs = np.asarray(batch_obs)
        b = batch_obs.shape[0]
        done = np.asarray(batch_done, dtype=bool)
        reset = np.asarray(batch_reset, dtype=bool)
        transition = Transition(
            obs=jnp.asarray(self._last_obs),
            action=jnp.asarray(self._last_action),
            reward=jnp.asarray(batch_reward, jnp.float32),
            next_obs=jnp.asarray(batch_obs),
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
        self._loss_stats.append(loss)
        self._q_stats.append(avg_q)

    # ----------------------------------------------------------------- stats
    def get_statistics(self):
        return [
            ("average_q", self._q_stats.mean()),
            ("average_loss", self._loss_stats.mean()),
            ("n_updates", int(self.train_state.n_updates) if self.train_state is not None else 0),
        ]


DQN.default_core = DQNCore
