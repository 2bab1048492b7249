"""Fully on-device training loops.

This is the TPU-native replacement for the reference's training drivers: the
per-step Python ``while`` of pfrl/experiments/train_agent.py:53-101 (and the
pipe round-trips of the batch driver) becomes ONE jitted function — act,
env step, replay insert, (gated) gradient update(s), target sync — iterated
with ``lax.scan``. A whole chunk of training (thousands of env steps ×
hundreds of lanes) runs per dispatch; the host only sees aggregated metrics.

Works with any JaxEnv + any functional agent core following the
``init/select_action/update/sync_target`` protocol (pfrl_tpu/agents).
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.core import FrozenDict

from pfrl_tpu.env import JaxEnv
from pfrl_tpu.envs.vector_jax_env import VectorJaxEnv
from pfrl_tpu.replay.transition import Transition


@dataclasses.dataclass
class RunnerConfig:
    """Static schedule config for the off-policy runner.

    Cadences are expressed in env *transitions* (matching the reference's
    ``t``): with L lanes, each scan step advances t by L, so
    ``updates_per_step = L * n_times_update / update_interval`` gradient
    steps run per scan step once ``t >= replay_start_size``.
    """

    num_envs: int = 128
    replay_start_size: int = 1000
    update_interval: int = 1
    n_times_update: int = 1
    target_update_interval: int = 1000
    minibatch_size: int = 32

    @property
    def updates_per_step(self) -> int:
        per = self.num_envs * self.n_times_update / self.update_interval
        assert per == int(per) and per >= 1, (
            f"num_envs*n_times_update ({self.num_envs}*{self.n_times_update}) "
            f"must be a multiple of update_interval ({self.update_interval})"
        )
        return int(per)


@struct.dataclass
class RunnerState:
    env_states: Any
    obs: Any
    train_state: Any
    replay_state: Any
    rng: jax.Array
    t: jax.Array                 # env transitions so far
    episode_return: jax.Array    # [L] running returns
    # Host-visible episodic stats (ring of recent completed returns):
    recent_returns: jax.Array    # [window]
    recent_count: jax.Array
    act_state: Any = ()          # recurrent carry for carry-ful cores


class OffPolicyRunner:
    """DQN-family / actor-critic off-policy training fused on device."""

    def __init__(
        self,
        env: JaxEnv,
        core,
        buffer,
        config: RunnerConfig,
        return_window: int = 256,
        mesh=None,
        data_axis: str = "dp",
    ):
        """``mesh``: optional jax.sharding.Mesh. With a mesh, env lanes and
        the replay ring shard over ``data_axis`` while agent params stay
        replicated — the SPMD replacement for the reference's process-pool
        env parallelism + shared-memory learners (SURVEY.md §2.6). Grad
        all-reduce is inserted by XLA from the sharded-batch/replicated-
        params contraction; collectives ride ICI.
        """
        self.env = VectorJaxEnv(env, config.num_envs)
        self.core = core
        self.buffer = buffer
        self.config = config
        self.return_window = return_window
        self.mesh = mesh
        self.data_axis = data_axis
        assert buffer.num_lanes == config.num_envs, (
            "buffer num_lanes must equal runner num_envs"
        )
        if mesh is not None:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            assert config.num_envs % n_dev == 0, (
                f"num_envs {config.num_envs} must divide over {n_dev} devices"
            )
        self._store_carries = (
            hasattr(core, "select_action_recurrent")
            and hasattr(core, "init_act_state")
            and getattr(buffer, "stores_carries", False)
        )
        self._jit_chunk = None

    def _state_shardings(self, state: "RunnerState"):
        """NamedShardings for a RunnerState: env lanes and the replay ring
        shard over the data axis (their leading dims are lane-major);
        params, trees, and scalars replicate."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        lane_sharded = NamedSharding(mesh, P(self.data_axis))
        replicated = NamedSharding(mesh, P())

        def all_lane(tree):
            return jax.tree.map(lambda _: lane_sharded, tree)

        def all_rep(tree):
            return jax.tree.map(lambda _: replicated, tree)

        replay = state.replay_state
        # Storage rows shard; cursor/trees/scalars replicate.
        replay_spec = jax.tree.map(lambda _: replicated, replay)
        replay_spec = replay_spec.replace(
            **(
                {"base": replay_spec.base.replace(storage=all_lane(replay.base.storage))}
                if hasattr(replay, "base")
                else {"storage": all_lane(replay.storage)}
            )
        )
        return RunnerState(
            env_states=all_lane(state.env_states),
            obs=all_lane(state.obs),
            train_state=all_rep(state.train_state),
            replay_state=replay_spec,
            rng=replicated,
            t=replicated,
            episode_return=lane_sharded,
            recent_returns=replicated,
            recent_count=replicated,
            # Recurrent act-time carries are per-lane state: shard with
            # the lanes (empty for carry-less cores).
            act_state=all_lane(state.act_state),
        )

    # ----------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> RunnerState:
        rng, rng_env, rng_core = jax.random.split(rng, 3)
        env_states, obs = self.env.reset(rng_env)
        example_actions = jnp.stack(
            [self._example_action()] * self.config.num_envs
        )
        train_state = self.core.init(rng_core, obs, example_actions)
        example_extras = FrozenDict()
        if self._store_carries:
            # Per-step recurrent snapshots ride in extras so random-offset
            # subsequence replay can warm-start mid-episode (the reference's
            # recurrent_state / next_recurrent_state, pfrl/agents/dqn.py:533-543).
            carry = self.core.init_act_state(self.config.num_envs)
            one = jax.tree.map(lambda x: x[0], carry)
            example_extras = FrozenDict({"carry": one, "next_carry": one})
        elif hasattr(self.core, "select_action_with_extras"):
            _, ex = jax.eval_shape(
                lambda ts, r, o: self.core.select_action_with_extras(
                    ts, r, o, jnp.zeros((), jnp.int32), True
                ),
                train_state,
                jax.random.PRNGKey(0),
                obs,
            )
            example_extras = FrozenDict(
                jax.tree.map(
                    lambda s: jnp.zeros(s.shape[1:], s.dtype), dict(ex)
                )
            )
        example = Transition(
            obs=jax.tree.map(lambda x: x[0], obs),
            action=self._example_action(),
            reward=jnp.zeros((), jnp.float32),
            next_obs=jax.tree.map(lambda x: x[0], obs),
            terminated=jnp.zeros((), bool),
            done=jnp.zeros((), bool),
            extras=example_extras,
        )
        replay_state = self.buffer.init(example)
        state = RunnerState(
            env_states=env_states,
            obs=obs,
            train_state=train_state,
            replay_state=replay_state,
            rng=rng,
            t=jnp.zeros((), jnp.int32),
            episode_return=jnp.zeros((self.config.num_envs,), jnp.float32),
            recent_returns=jnp.zeros((self.return_window,), jnp.float32),
            recent_count=jnp.zeros((), jnp.int32),
        )
        if hasattr(self.core, "init_act_state"):
            state = state.replace(
                act_state=self.core.init_act_state(self.config.num_envs)
            )
        # De-alias: init may share buffers between leaves (target_params is
        # params, zeros constants are cached); donation requires each
        # flattened argument to own its buffer.
        state = jax.tree.map(
            lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
            state,
        )
        if self.mesh is not None:
            state = jax.device_put(state, self._state_shardings(state))
        return state

    def _example_action(self):
        space = self.env.action_space
        if hasattr(space, "n"):
            return jnp.zeros((), jnp.int32)
        return jnp.zeros(space.shape, jnp.float32)

    # ----------------------------------------------------------------- step
    def _one_step(self, state: RunnerState, _) -> Tuple[RunnerState, dict]:
        cfg = self.config
        rng, rng_act, rng_env, rng_upd = jax.random.split(state.rng, 4)

        extras = FrozenDict()
        if hasattr(self.core, "select_action_recurrent"):
            actions, act_state = self.core.select_action_recurrent(
                state.train_state, rng_act, state.obs, state.t, True,
                state.act_state,
            )
        elif hasattr(self.core, "select_action_with_extras"):
            actions, ex = self.core.select_action_with_extras(
                state.train_state, rng_act, state.obs, state.t, True
            )
            extras = FrozenDict(ex)
            act_state = state.act_state
        else:
            actions = self.core.select_action(
                state.train_state, rng_act, state.obs, state.t, True
            )
            act_state = state.act_state
        env_states, vec = self.env.step(rng_env, state.env_states, actions)
        ts = vec.ts
        if self._store_carries:
            # Snapshot BEFORE the episode-boundary reset: the pre-step carry
            # seeds a replayed window's online unroll, the post-step carry
            # seeds the target unroll over next_obs (reference semantics,
            # pfrl/agents/dqn.py:533-543).
            extras = FrozenDict(
                {"carry": state.act_state, "next_carry": act_state}
            )
        if hasattr(self.core, "reset_act_state"):
            act_state = self.core.reset_act_state(act_state, ts.done)

        transition = Transition(
            obs=state.obs,
            action=actions,
            reward=ts.reward,
            next_obs=ts.obs,
            terminated=ts.terminated,
            done=ts.done,
            extras=extras,
        )
        replay_state = self.buffer.add(state.replay_state, transition)
        t = state.t + cfg.num_envs

        # Episode-return bookkeeping (device-side recent window).
        ep_ret = state.episode_return + ts.reward
        finished = ts.done
        n_finished = jnp.sum(finished.astype(jnp.int32))
        # Write finished returns into the ring (scatter; order irrelevant).
        lane_order = jnp.argsort(~finished)  # finished lanes first
        sorted_fin = finished[lane_order]
        sorted_ret = ep_ret[lane_order]
        pos = (state.recent_count + jnp.arange(cfg.num_envs, dtype=jnp.int32)) % self.return_window
        write_pos = jnp.where(sorted_fin, pos, self.return_window)  # OOB drops
        recent = state.recent_returns
        recent = recent.at[write_pos].set(sorted_ret, mode="drop")
        recent_count = state.recent_count + n_finished
        ep_ret = jnp.where(finished, 0.0, ep_ret)

        # Gated updates.
        train_state, replay_state2, aux = self._maybe_update(
            state.train_state, replay_state, rng_upd, t
        )

        # Target sync on interval crossing (in env transitions).
        if hasattr(self.core, "sync_target"):
            crossed = (t // cfg.target_update_interval) != (
                state.t // cfg.target_update_interval
            )
            train_state = jax.lax.cond(
                crossed, self.core.sync_target, lambda s: s, train_state
            )

        metrics = {
            "reward_mean": jnp.mean(ts.reward),
            "loss": aux["loss"],
            "done_count": n_finished,
        }
        new_state = RunnerState(
            env_states=env_states,
            obs=vec.obs,
            train_state=train_state,
            replay_state=replay_state2,
            rng=rng,
            t=t,
            episode_return=ep_ret,
            recent_returns=recent,
            recent_count=recent_count,
            act_state=act_state,
        )
        return new_state, metrics

    def _maybe_update(self, train_state, replay_state, rng, t):
        cfg = self.config

        episodic = hasattr(self.buffer, "sample_episodes")

        # Only the light replay state (cursor / priority trees / beta) flows
        # through the cond and the update loop; the multi-GB transition
        # storage is closed over read-only. Carrying it would defeat XLA's
        # buffer aliasing — lax.cond cannot alias outputs to operands when
        # branches differ, which silently copies the whole ring every env
        # step (measured: 4.7x end-to-end slowdown at a 100k-frame ring).
        light0, storage = self.buffer.split_storage(replay_state)

        # Uniform buffers (no priority feedback) draw iid minibatches, so
        # all updates_per_step batches can be gathered in ONE sample op and
        # sliced inside the loop — the per-iteration work shrinks to the
        # gradient step itself. Priority/episodic buffers keep the
        # sequential sample-then-feedback path (their iterations are
        # order-dependent).
        presample = not episodic and getattr(self.buffer, "iid_samples", False)

        def do_updates(args):
            train_state, light, rng = args

            if presample:
                rng, rng_s = jax.random.split(rng)
                full = self.buffer.merge_storage(light, storage)
                # Draw ALL minibatch indices in one op, but gather each
                # minibatch's rows inside the loop. Pre-gathering the
                # whole [U, B, ...] batch tensor and slicing per update
                # costs 2x the batch bytes in HBM traffic (gather write +
                # dynamic-slice relayout copy, dequantized to f32) — the
                # profiler measured that slice fusion as the TOP op of
                # the DQN anchor (59% of device time at batch 32,
                # benchmarks/profile_dqn_step.json). Per-iteration row
                # gathers move only the rows an update consumes. The RNG
                # stream is unchanged (sample == sample_indices+gather).
                all_ids = self.buffer.sample_indices(
                    full, rng_s, cfg.updates_per_step * cfg.minibatch_size
                ).reshape((cfg.updates_per_step, cfg.minibatch_size))

                def body_pre(i, carry):
                    train_state, rng, _ = carry
                    rng, rng_u = jax.random.split(rng)
                    batch = self.buffer.gather(full, all_ids[i])
                    train_state, aux = self.core.update(
                        train_state, rng_u, batch
                    )
                    return (train_state, rng, aux["loss"])

                train_state, _, loss = jax.lax.fori_loop(
                    0,
                    cfg.updates_per_step,
                    body_pre,
                    (train_state, rng, jnp.zeros((), jnp.float32)),
                )
                return train_state, light, {"loss": loss}

            def body(_, carry):
                train_state, light, rng, _ = carry
                rng, rng_s, rng_u = jax.random.split(rng, 3)
                full = self.buffer.merge_storage(light, storage)
                if episodic:
                    batch = self.buffer.sample_episodes(
                        full, rng_s, cfg.minibatch_size
                    )
                    train_state, aux = self.core.update_episodic(
                        train_state, rng_u, batch
                    )
                    # Per-episode priority feedback (the reference's
                    # update_errors loop for prioritized episodic replay,
                    # pfrl/replay_buffers/prioritized_episodic.py:60-80):
                    # cores report one error per sampled window.
                    if hasattr(self.buffer, "update_episode_priorities") and getattr(
                        self.core, "reports_window_errors", False
                    ):
                        full = self.buffer.update_episode_priorities(
                            full, batch.rows, aux["errors"]
                        )
                        light, _ = self.buffer.split_storage(full)
                    return (train_state, light, rng, aux["loss"])
                out = self.buffer.sample(full, rng_s, cfg.minibatch_size)
                if isinstance(out, tuple):
                    batch, full = out
                else:
                    batch = out
                train_state, aux = self.core.update(train_state, rng_u, batch)
                full = self.buffer.update_priorities(
                    full, batch.indices, aux["errors"]
                )
                light, _ = self.buffer.split_storage(full)
                return (train_state, light, rng, aux["loss"])

            init = (train_state, light, rng, jnp.zeros((), jnp.float32))
            train_state, light, _, loss = jax.lax.fori_loop(
                0, cfg.updates_per_step, body, init
            )
            return train_state, light, {"loss": loss}

        def no_update(args):
            train_state, light, _ = args
            return train_state, light, {"loss": jnp.zeros((), jnp.float32)}

        train_state, light, aux = jax.lax.cond(
            t >= cfg.replay_start_size,
            do_updates,
            no_update,
            (train_state, light0, rng),
        )
        return train_state, self.buffer.merge_storage(light, storage), aux

    # ---------------------------------------------------------------- chunks
    def run_chunk(self, state: RunnerState, num_steps: int) -> Tuple[RunnerState, dict]:
        """Run ``num_steps`` scan iterations (num_steps * L env transitions)."""
        if self._jit_chunk is None:
            def chunk(state, length):
                return jax.lax.scan(self._one_step, state, None, length=length)

            # donate_argnums aliases the RunnerState into the output —
            # without it XLA may materialize a copy of the (multi-GB for
            # Atari) replay ring per dispatch.
            if self.mesh is None:
                self._jit_chunk = jax.jit(
                    chunk, static_argnames=("length",), donate_argnums=(0,)
                )
            else:
                shardings = self._state_shardings(state)
                jitted = jax.jit(
                    chunk,
                    static_argnums=(1,),
                    in_shardings=(shardings,),
                    out_shardings=(shardings, None),
                    donate_argnums=(0,),
                )
                self._jit_chunk = lambda s, length: jitted(s, length)
        state, metrics = self._jit_chunk(state, length=num_steps)
        return state, metrics

    def recent_return_mean(self, state: RunnerState) -> float:
        n = int(np.minimum(int(state.recent_count), self.return_window))
        if n == 0:
            return float("nan")
        return float(np.asarray(state.recent_returns)[:n].mean()) if int(
            state.recent_count
        ) < self.return_window else float(np.asarray(state.recent_returns).mean())


class JaxEvalLoop:
    """Greedy evaluation over a vmapped env, fully jitted.

    Runs lanes for ``max_steps`` and scores the FIRST completed episode of
    each lane (no length bias: every lane contributes exactly one episode,
    mirroring the first-n bookkeeping of evaluator.py:100-251).
    """

    def __init__(self, env: JaxEnv, core, num_episodes: int, max_steps: int):
        self.env = VectorJaxEnv(env, num_episodes)
        self.core = core
        self.max_steps = max_steps
        self._jit_run = jax.jit(self._run)

    def _run(self, train_state, rng):
        rng, rng_reset = jax.random.split(rng)
        env_states, obs = self.env.reset(rng_reset)
        L = self.env.num_envs
        recurrent = hasattr(self.core, "select_action_recurrent")
        act_state0 = (
            self.core.init_act_state(L) if hasattr(self.core, "init_act_state") else ()
        )

        def body(carry, _):
            env_states, obs, rng, ep_ret, final_ret, finished, act_state = carry
            rng, rng_act, rng_env = jax.random.split(rng, 3)
            if recurrent:
                actions, act_state = self.core.select_action_recurrent(
                    train_state, rng_act, obs, jnp.zeros((), jnp.int32), False,
                    act_state,
                )
            else:
                actions = self.core.select_action(
                    train_state, rng_act, obs, jnp.zeros((), jnp.int32), False
                )
            env_states, vec = self.env.step(rng_env, env_states, actions)
            if hasattr(self.core, "reset_act_state"):
                act_state = self.core.reset_act_state(act_state, vec.ts.done)
            ep_ret = ep_ret + vec.ts.reward * (~finished)
            newly = vec.ts.done & (~finished)
            final_ret = jnp.where(newly, ep_ret, final_ret)
            finished = finished | vec.ts.done
            return (
                env_states, vec.obs, rng, ep_ret, final_ret, finished, act_state
            ), None

        init = (
            env_states,
            obs,
            rng,
            jnp.zeros((L,), jnp.float32),
            jnp.zeros((L,), jnp.float32),
            jnp.zeros((L,), bool),
            act_state0,
        )
        (env_states, obs, rng, ep_ret, final_ret, finished, _), _ = jax.lax.scan(
            body, init, None, length=self.max_steps
        )
        # Lanes that never finished contribute their partial return.
        final_ret = jnp.where(finished, final_ret, ep_ret)
        return final_ret

    def evaluate(self, train_state, rng) -> np.ndarray:
        return np.asarray(self._jit_run(train_state, rng))
