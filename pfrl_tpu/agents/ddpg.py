"""DDPG — deterministic actor-critic.

Reference parity: pfrl/agents/ddpg.py:22-312. Functional core: critic TD
step + deterministic policy-gradient step fused in one jitted update;
hard/soft target sync for both nets; optional burn-in random actions before
learning starts (ddpg.py burnin_action_func).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pfrl_tpu.agent import AttributeSavingMixin, BatchAgent
from pfrl_tpu.ops.value_loss import compute_value_loss
from pfrl_tpu.replay.transition import TransitionBatch
from pfrl_tpu.utils.copy_param import soft_copy_param
from pfrl_tpu.utils.precision import apply_cast


@struct.dataclass
class ActorCriticState:
    policy_params: Any
    q_params: Any
    target_policy_params: Any
    target_q_params: Any
    policy_opt_state: Any
    q_opt_state: Any
    n_updates: jax.Array
    extras: Any = None  # e.g. SAC temperature


def _identity(x):
    return x


class DDPGCore:
    def __init__(
        self,
        policy,                      # module: obs -> Distribution (Delta)
        q_func,                      # module: (obs, action) -> Q
        policy_optimizer: optax.GradientTransformation,
        q_optimizer: optax.GradientTransformation,
        explorer=None,
        gamma: float = 0.99,
        clip_delta: bool = True,
        target_update_method: str = "soft",
        soft_update_tau: float = 5e-3,
        phi: Callable = _identity,
        burnin_action_func: Optional[Callable] = None,
        burnin_steps: int = 0,
        compute_dtype: Optional[Any] = None,
    ):
        self.policy = policy
        self.q_func = q_func
        self.policy_optimizer = policy_optimizer
        self.q_optimizer = q_optimizer
        self.explorer = explorer
        self.gamma = gamma
        self.clip_delta = clip_delta
        self.target_update_method = target_update_method
        self.soft_update_tau = soft_update_tau
        self.phi = phi
        self.burnin_action_func = burnin_action_func
        self.burnin_steps = burnin_steps
        # Mixed precision (TPU-native; see utils/precision.py): bf16
        # actor/critic forward+backward over fp32 masters; TD targets,
        # losses, and optimizer updates stay fp32.
        self.compute_dtype = compute_dtype

    # ----------------------------------------------------------------- setup
    def init(self, rng: jax.Array, example_obs, example_action) -> ActorCriticState:
        rng_p, rng_q = jax.random.split(rng)
        x = self.phi(example_obs)
        policy_params = self.policy.init(rng_p, x)
        q_params = self.q_func.init(rng_q, x, example_action)
        return ActorCriticState(
            policy_params=policy_params,
            q_params=q_params,
            target_policy_params=policy_params,
            target_q_params=q_params,
            policy_opt_state=self.policy_optimizer.init(policy_params),
            q_opt_state=self.q_optimizer.init(q_params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def policy_dist(self, params, obs):
        return apply_cast(self.policy, params, self.compute_dtype, self.phi(obs))

    def _q(self, params, x, a):
        return apply_cast(self.q_func, params, self.compute_dtype, x, a)

    def select_action(self, state, rng, obs, t, training: bool):
        dist = self.policy_dist(state.policy_params, obs)
        greedy = dist.mode()
        if not training:
            return greedy
        rng_exp, rng_burn = jax.random.split(rng)
        if self.explorer is not None:
            a = self.explorer.select_action(rng_exp, t, greedy)
        else:
            a = greedy
        if self.burnin_action_func is not None and self.burnin_steps > 0:
            burn = self.burnin_action_func(rng_burn, jax.tree.leaves(obs)[0].shape[0])
            a = jnp.where(t < self.burnin_steps, burn, a)
        return a

    # ---------------------------------------------------------------- update
    def target_next_q(self, state, rng, batch: TransitionBatch):
        next_dist = self.policy_dist(state.target_policy_params, batch.next_obs)
        next_a = next_dist.mode()
        return self._q(state.target_q_params, self.phi(batch.next_obs), next_a)

    def critic_loss(self, q_params, state, rng, batch: TransitionBatch):
        next_q = self.target_next_q(state, rng, batch)
        t = batch.reward + batch.discount * (
            1.0 - batch.is_terminal.astype(jnp.float32)
        ) * jax.lax.stop_gradient(next_q)
        y = self._q(q_params, self.phi(batch.obs), batch.action)
        loss = compute_value_loss(y, t, clip_delta=self.clip_delta)
        return loss, jnp.abs(y - t)

    def actor_loss(self, policy_params, state, rng, batch: TransitionBatch):
        dist = self.policy_dist(policy_params, batch.obs)
        onpolicy_a = dist.mode()
        q = self._q(state.q_params, self.phi(batch.obs), onpolicy_a)
        return -jnp.mean(q)

    def update(self, state: ActorCriticState, rng: jax.Array, batch: TransitionBatch):
        rng_c, rng_a = jax.random.split(rng)
        (c_loss, errors), q_grads = jax.value_and_grad(
            self.critic_loss, has_aux=True
        )(state.q_params, state, rng_c, batch)
        q_updates, q_opt_state = self.q_optimizer.update(
            q_grads, state.q_opt_state, state.q_params
        )
        q_params = optax.apply_updates(state.q_params, q_updates)
        state = state.replace(q_params=q_params, q_opt_state=q_opt_state)

        a_loss, p_grads = jax.value_and_grad(self.actor_loss)(
            state.policy_params, state, rng_a, batch
        )
        p_updates, p_opt_state = self.policy_optimizer.update(
            p_grads, state.policy_opt_state, state.policy_params
        )
        policy_params = optax.apply_updates(state.policy_params, p_updates)
        state = state.replace(
            policy_params=policy_params,
            policy_opt_state=p_opt_state,
            n_updates=state.n_updates + 1,
        )
        if self.target_update_method == "soft":
            # The reference syncs soft targets every update (ddpg.py).
            state = self.sync_target(state)
        aux = {
            "loss": c_loss,
            "actor_loss": a_loss,
            "average_q": jnp.zeros(()),
            "errors": jax.lax.stop_gradient(errors),
        }
        return state, aux

    def sync_target(self, state: ActorCriticState) -> ActorCriticState:
        if self.target_update_method == "hard":
            return state.replace(
                target_policy_params=state.policy_params,
                target_q_params=state.q_params,
            )
        return state.replace(
            target_policy_params=soft_copy_param(
                state.target_policy_params, state.policy_params, self.soft_update_tau
            ),
            target_q_params=soft_copy_param(
                state.target_q_params, state.q_params, self.soft_update_tau
            ),
        )


class ActorCriticShellAgent(AttributeSavingMixin, BatchAgent):
    """Shared host shell for DDPG/TD3/SAC (pfrl protocol)."""

    saved_attributes = ("train_state",)
    default_core = None

    def __init__(
        self,
        core,
        replay_buffer,
        *,
        replay_start_size: int = 10000,
        minibatch_size: int = 100,
        update_interval: int = 1,
        target_update_interval: int = 1,
        n_times_update: int = 1,
        update_burst: bool = False,
        seed: int = 0,
    ):
        import numpy as np

        self._np = np
        self.core = core
        self.buffer = replay_buffer
        self.replay_start_size = replay_start_size
        self.minibatch_size = minibatch_size
        self.update_interval = update_interval
        self.target_update_interval = target_update_interval
        self.n_times_update = n_times_update
        # Burst mode runs the n due updates of a step as ONE jitted
        # lax.scan dispatch instead of n dispatches — same sample/update
        # math (the RNG split chain is carried through the scan), but the
        # host->device round trip amortizes over the burst. This is what
        # makes reference-ratio (1 update per env step) training on host
        # envs dispatch-bound rather than latency-bound on TPU.
        self.update_burst = update_burst
        self._jit_burst = None
        self.rng = jax.random.PRNGKey(seed)
        self.t = 0
        self.train_state = None
        self.replay_state = None
        self._last_obs = None
        self._last_action = None
        self._jit_act = None
        self._jit_update = None
        from pfrl_tpu.utils.stats import RunningStats

        self._loss_stats = RunningStats(100)

    def _next_rng(self):
        self.rng, out = jax.random.split(self.rng)
        return out

    def _example_action(self, batch: int):
        import numpy as np

        space = self.core_action_space
        return jnp.asarray(
            np.stack([space.sample(np.random) for _ in range(batch)]).astype(
                np.float32
            )
        )

    def batch_act(self, batch_obs):
        import numpy as np

        batch_obs = np.asarray(batch_obs)
        if self.train_state is None:
            example_a = self._example_action(batch_obs.shape[0])
            self.train_state = self.core.init(
                self._next_rng(), jnp.asarray(batch_obs), example_a
            )
            self._restore_pending()
            self._jit_act = jax.jit(
                self.core.select_action, static_argnames=("training",)
            )
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

    def batch_observe(self, batch_obs, batch_reward, batch_done, batch_reset):
        import numpy as np
        from flax.core import FrozenDict

        from pfrl_tpu.replay.transition import Transition

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
            if getattr(self.buffer, "num_lanes", 1) != b:
                self.buffer = self.buffer.configure_lanes(b)
            example = jax.tree.map(lambda x: x[0], transition)
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
                return train_state, replay_state, aux["loss"]

            self._jit_update = jax.jit(fused_update)

            def burst_update(train_state, replay_state, rng, n):
                def body(carry, _):
                    ts, rs, r = carry
                    r, sub = jax.random.split(r)
                    ts, rs, loss = fused_update(ts, rs, sub)
                    return (ts, rs, r), loss

                (train_state, replay_state, rng), losses = jax.lax.scan(
                    body, (train_state, replay_state, rng), None, length=n
                )
                return train_state, replay_state, losses

            self._jit_burst = jax.jit(burst_update, static_argnums=(3,))
        self.replay_state = self.buffer.add(self.replay_state, transition)

        prev_t = self.t
        self.t += b
        if (
            self.core.target_update_method == "hard"
            and prev_t // self.target_update_interval
            != self.t // self.target_update_interval
        ):
            self.train_state = self.core.sync_target(self.train_state)
        if self.t >= self.replay_start_size:
            n = self.t // self.update_interval - prev_t // self.update_interval
            n_updates = n * self.n_times_update
            if self.update_burst and n_updates > 1:
                self.train_state, self.replay_state, losses = self._jit_burst(
                    self.train_state, self.replay_state, self._next_rng(),
                    n_updates,
                )
                self._loss_stats.append(jnp.mean(losses))
            else:
                for _ in range(n_updates):
                    self.train_state, self.replay_state, loss = self._jit_update(
                        self.train_state, self.replay_state, self._next_rng()
                    )
                    self._loss_stats.append(loss)

    def get_statistics(self):
        return [
            ("average_critic_loss", self._loss_stats.mean()),
            (
                "n_updates",
                int(self.train_state.n_updates) if self.train_state is not None else 0,
            ),
        ]


class DDPG(ActorCriticShellAgent):
    """pfrl-protocol DDPG agent (ddpg.py:22-312)."""

    def __init__(
        self,
        policy,
        q_func,
        policy_optimizer,
        q_optimizer,
        replay_buffer,
        gamma,
        explorer,
        *,
        action_space,
        gpu=None,
        replay_start_size=10000,
        minibatch_size=100,
        update_interval=1,
        target_update_interval=1,
        phi=_identity,
        target_update_method="soft",
        soft_update_tau=5e-3,
        n_times_update=1,
        update_burst=False,
        burnin_action_func=None,
        burnin_steps=0,
        compute_dtype=None,
        seed=0,
    ):
        del gpu
        core = DDPGCore(
            policy=policy,
            q_func=q_func,
            policy_optimizer=policy_optimizer,
            q_optimizer=q_optimizer,
            explorer=explorer,
            gamma=gamma,
            target_update_method=target_update_method,
            soft_update_tau=soft_update_tau,
            phi=phi,
            burnin_action_func=burnin_action_func,
            burnin_steps=burnin_steps,
            compute_dtype=compute_dtype,
        )
        super().__init__(
            core,
            replay_buffer,
            replay_start_size=replay_start_size,
            minibatch_size=minibatch_size,
            update_interval=update_interval,
            target_update_interval=target_update_interval,
            n_times_update=n_times_update,
            update_burst=update_burst,
            seed=seed,
        )
        self.core_action_space = action_space
