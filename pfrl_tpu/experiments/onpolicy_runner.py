"""Fully on-device on-policy training (PPO / A2C / TRPO cores).

The on-policy analog of OffPolicyRunner: one jitted function collects a
``[T, L]`` rollout with ``lax.scan`` (act + env step fused) and immediately
runs the core's update (PPO's whole epochs x minibatch loop is itself
jitted), so a full PPO iteration — thousands of env transitions plus tens
of gradient steps — is a single XLA program. This replaces the reference's
python collection loop + GAE-per-episode + torch minibatching
(pfrl/agents/ppo.py:260-532) at device speed.
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pfrl_tpu.agents.ppo import Rollout
from pfrl_tpu.env import JaxEnv
from pfrl_tpu.envs.vector_jax_env import VectorJaxEnv


@struct.dataclass
class OnPolicyRunnerState:
    env_states: Any
    obs: Any
    train_state: Any
    rng: jax.Array
    t: jax.Array
    episode_return: jax.Array
    recent_returns: jax.Array
    recent_count: jax.Array
    act_state: Any = ()   # recurrent carry for carry-ful cores


class OnPolicyRunner:
    def __init__(
        self,
        env: JaxEnv,
        core,                    # PPOCore / A2CCore / TRPOCore
        num_envs: int,
        rollout_len: int,
        return_window: int = 256,
        mesh=None,
        data_axis: str = "dp",
    ):
        """``mesh``: optional jax.sharding.Mesh. Env lanes (and therefore
        every ``[T, L]`` rollout tensor) shard over ``data_axis`` while the
        train state stays replicated — the SPMD replacement for the
        reference's vectorized-env process pool driving PPO/A2C
        (pfrl/experiments/train_agent_batch.py:10-154). The PPO epoch loop
        contracts sharded minibatches against replicated params, so XLA
        inserts the gradient all-reduce; collectives ride ICI.
        """
        self.env = VectorJaxEnv(env, num_envs)
        self.core = core
        self.num_envs = num_envs
        self.rollout_len = rollout_len
        self.return_window = return_window
        self.mesh = mesh
        self.data_axis = data_axis
        if mesh is not None:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            assert num_envs % n_dev == 0, (
                f"num_envs {num_envs} must divide over {n_dev} devices"
            )
        self._jit_iteration = None

    def _state_shardings(self, state: "OnPolicyRunnerState"):
        """Lane-major leaves shard over the data axis; params/scalars
        replicate (same layout discipline as OffPolicyRunner)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        lane_sharded = NamedSharding(self.mesh, P(self.data_axis))
        replicated = NamedSharding(self.mesh, P())

        def all_lane(tree):
            return jax.tree.map(lambda _: lane_sharded, tree)

        def all_rep(tree):
            return jax.tree.map(lambda _: replicated, tree)

        return OnPolicyRunnerState(
            env_states=all_lane(state.env_states),
            obs=all_lane(state.obs),
            train_state=all_rep(state.train_state),
            rng=replicated,
            t=replicated,
            episode_return=lane_sharded,
            recent_returns=replicated,
            recent_count=replicated,
            act_state=all_lane(state.act_state),
        )

    def init(self, rng: jax.Array) -> OnPolicyRunnerState:
        rng, rng_env, rng_core = jax.random.split(rng, 3)
        env_states, obs = self.env.reset(rng_env)
        train_state = self.core.init(rng_core, obs)
        act_state = (
            self.core.init_act_state(self.num_envs)
            if getattr(self.core, "recurrent", False)
            else ()
        )
        state = OnPolicyRunnerState(
            env_states=env_states,
            obs=obs,
            train_state=train_state,
            rng=rng,
            t=jnp.zeros((), jnp.int32),
            episode_return=jnp.zeros((self.num_envs,), jnp.float32),
            recent_returns=jnp.zeros((self.return_window,), jnp.float32),
            recent_count=jnp.zeros((), jnp.int32),
            act_state=act_state,
        )
        # De-alias for donation (see OffPolicyRunner.init).
        state = jax.tree.map(
            lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
            state,
        )
        if self.mesh is not None:
            state = jax.device_put(state, self._state_shardings(state))
        return state

    # ------------------------------------------------------------- iteration
    def _collect_step(self, carry, _):
        (env_states, obs, train_state, rng, ep_ret, recent, count, act_state) = carry
        rng, rng_act, rng_env = jax.random.split(rng, 3)
        recurrent = getattr(self.core, "recurrent", False)
        if recurrent:
            pre_act_carry = act_state
            action, aux, act_state = self.core.act_with_aux_recurrent(
                train_state, rng_act, obs, True, act_state
            )
        else:
            action, aux = self.core.act_with_aux(train_state, rng_act, obs, True)
        env_states, vec = self.env.step(rng_env, env_states, action)
        ts = vec.ts
        if recurrent:
            # V(s_{t+1}) on the pre-reset next obs with the post-step carry
            # (GAE stays exact through truncations), then reset ended rows.
            next_value = self.core.value_recurrent(train_state, ts.obs, act_state)
            act_state = self.core.reset_act_state(act_state, ts.done)

        ep_ret = ep_ret + ts.reward
        finished = ts.done
        n_fin = jnp.sum(finished.astype(jnp.int32))
        order = jnp.argsort(~finished)
        pos = (count + jnp.arange(self.num_envs, dtype=jnp.int32)) % self.return_window
        write_pos = jnp.where(finished[order], pos, self.return_window)
        recent = recent.at[write_pos].set(ep_ret[order], mode="drop")
        count = count + n_fin
        ep_ret = jnp.where(finished, 0.0, ep_ret)

        step_data = (
            obs,
            action,
            aux["log_prob"],
            aux["value"],
            ts.reward,
            ts.terminated,
            ts.done,
            ts.obs,
        )
        if recurrent:
            step_data = step_data + (pre_act_carry, next_value)
        return (
            env_states, vec.obs, train_state, rng, ep_ret, recent, count,
            act_state,
        ), step_data

    def _iteration(self, state: OnPolicyRunnerState):
        carry = (
            state.env_states,
            state.obs,
            state.train_state,
            state.rng,
            state.episode_return,
            state.recent_returns,
            state.recent_count,
            state.act_state,
        )
        carry, steps = jax.lax.scan(
            self._collect_step, carry, None, length=self.rollout_len
        )
        (env_states, obs, train_state, rng, ep_ret, recent, count, act_state) = carry
        rollout = Rollout(
            obs=steps[0],
            action=steps[1],
            log_prob=steps[2],
            value=steps[3],
            reward=steps[4],
            terminated=steps[5],
            done=steps[6],
            next_obs=steps[7],
            carry=steps[8] if len(steps) > 8 else (),
            next_value=steps[9] if len(steps) > 8 else None,
        )
        rng, rng_upd = jax.random.split(rng)
        train_state, aux = self.core.update(train_state, rng_upd, rollout)
        new_state = OnPolicyRunnerState(
            env_states=env_states,
            obs=obs,
            train_state=train_state,
            rng=rng,
            t=state.t + self.rollout_len * self.num_envs,
            episode_return=ep_ret,
            recent_returns=recent,
            recent_count=count,
            act_state=act_state,
        )
        return new_state, aux

    def run_iterations(self, state: OnPolicyRunnerState, n: int):
        """Run n collect+update iterations under one jit (scan over n)."""
        if self._jit_iteration is None:
            def multi(state, n_iter):
                def body(s, _):
                    return self._iteration(s)
                return jax.lax.scan(body, state, None, length=n_iter)
            if self.mesh is None:
                self._jit_iteration = jax.jit(
                    multi, static_argnums=(1,), donate_argnums=(0,)
                )
            else:
                shardings = self._state_shardings(state)
                jitted = jax.jit(
                    multi,
                    static_argnums=(1,),
                    in_shardings=(shardings,),
                    out_shardings=(shardings, None),
                    donate_argnums=(0,),
                )
                self._jit_iteration = jitted
        return self._jit_iteration(state, n)

    def recent_return_mean(self, state) -> float:
        n = int(np.minimum(int(state.recent_count), self.return_window))
        if n == 0:
            return float("nan")
        if int(state.recent_count) < self.return_window:
            return float(np.asarray(state.recent_returns)[:n].mean())
        return float(np.asarray(state.recent_returns).mean())
