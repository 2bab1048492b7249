"""TD3 — twin critics, delayed policy updates, target-policy smoothing.

Reference parity: pfrl/agents/td3.py:28-328. The delayed policy update
(td3.py:252-259) is a branchless masked step under jit: the actor gradient
is computed every call but scaled to zero on off-cycle updates (same
trajectory as the reference for policy_update_delay | n_updates).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pfrl_tpu.agents.ddpg import ActorCriticShellAgent, _identity
from pfrl_tpu.agents.soft_actor_critic import _stack_pair, _twin_compatible
from pfrl_tpu.ops.value_loss import compute_value_loss
from pfrl_tpu.replay.transition import TransitionBatch
from pfrl_tpu.utils.copy_param import soft_copy_param
from pfrl_tpu.utils.precision import apply_cast, cast_floating, cast_to_float32


@struct.dataclass
class TD3State:
    policy_params: Any
    q1_params: Any
    q2_params: Any
    target_policy_params: Any
    target_q1_params: Any
    target_q2_params: Any
    policy_opt_state: Any
    q1_opt_state: Any
    q2_opt_state: Any
    n_updates: jax.Array


def default_target_policy_smoothing_func(rng, batch_action):
    """Clipped Gaussian noise on target actions (td3.py:22-25)."""
    noise = jnp.clip(0.2 * jax.random.normal(rng, batch_action.shape), -0.5, 0.5)
    return jnp.clip(batch_action + noise, -1.0, 1.0)


class TD3Core:
    def __init__(
        self,
        policy,
        q_func1,
        q_func2,
        policy_optimizer: optax.GradientTransformation,
        q_func1_optimizer: optax.GradientTransformation,
        q_func2_optimizer: optax.GradientTransformation,
        explorer=None,
        gamma: float = 0.99,
        soft_update_tau: float = 5e-3,
        policy_update_delay: int = 2,
        target_policy_smoothing_func: Callable = default_target_policy_smoothing_func,
        phi: Callable = _identity,
        burnin_action_func: Optional[Callable] = None,
        burnin_steps: int = 0,
        compute_dtype: Optional[Any] = None,
    ):
        self.policy = policy
        self.q_func1 = q_func1
        self.q_func2 = q_func2
        self.policy_optimizer = policy_optimizer
        self.q_func1_optimizer = q_func1_optimizer
        self.q_func2_optimizer = q_func2_optimizer
        self.explorer = explorer
        self.gamma = gamma
        self.soft_update_tau = soft_update_tau
        self.policy_update_delay = policy_update_delay
        self.smoothing = target_policy_smoothing_func
        self.phi = phi
        self.burnin_action_func = burnin_action_func
        self.burnin_steps = burnin_steps
        self.target_update_method = "soft"
        self._twin_fused = False
        # Mixed precision (TPU-native; see utils/precision.py): bf16
        # actor/critic applies over fp32 masters; smoothing noise, TD
        # targets, and losses stay fp32.
        self.compute_dtype = compute_dtype

    def init(self, rng, example_obs, example_action) -> TD3State:
        rng_p, rng_q1, rng_q2 = jax.random.split(rng, 3)
        x = self.phi(example_obs)
        policy_params = self.policy.init(rng_p, x)
        q1 = self.q_func1.init(rng_q1, x, example_action)
        q2 = self.q_func2.init(rng_q2, x, example_action)
        self._twin_fused = _twin_compatible(q1, q2)
        return TD3State(
            policy_params=policy_params,
            q1_params=q1,
            q2_params=q2,
            target_policy_params=policy_params,
            target_q1_params=q1,
            target_q2_params=q2,
            policy_opt_state=self.policy_optimizer.init(policy_params),
            q1_opt_state=self.q_func1_optimizer.init(q1),
            q2_opt_state=self.q_func2_optimizer.init(q2),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def _policy_dist(self, params, obs):
        return apply_cast(self.policy, params, self.compute_dtype, self.phi(obs))

    def select_action(self, state, rng, obs, t, training: bool):
        dist = self._policy_dist(state.policy_params, obs)
        greedy = dist.mode()
        if not training:
            return greedy
        rng_exp, rng_burn = jax.random.split(rng)
        a = (
            self.explorer.select_action(rng_exp, t, greedy)
            if self.explorer is not None
            else greedy
        )
        if self.burnin_action_func is not None and self.burnin_steps > 0:
            burn = self.burnin_action_func(
                rng_burn, jax.tree.leaves(obs)[0].shape[0]
            )
            a = jnp.where(t < self.burnin_steps, burn, a)
        return a

    # ---------------------------------------------------------------- update
    def _apply_twin(self, p1, p2, x, a):
        """One vmapped stacked apply for identical twin critics (see
        SACCore._apply_twin — halves the op count of the critic path)."""
        dt = self.compute_dtype
        x, a = cast_floating(x, dt), cast_floating(a, dt)
        if self._twin_fused:
            y = jax.vmap(lambda p: self.q_func1.apply(p, x, a))(
                cast_floating(_stack_pair(p1, p2), dt)
            )
            y = cast_to_float32(y) if dt is not None else y
            return y[0], y[1]
        y1 = self.q_func1.apply(cast_floating(p1, dt), x, a)
        y2 = self.q_func2.apply(cast_floating(p2, dt), x, a)
        if dt is not None:
            y1, y2 = cast_to_float32(y1), cast_to_float32(y2)
        return y1, y2

    def critic_losses(self, q1_params, q2_params, state, rng, batch):
        next_dist = self._policy_dist(state.target_policy_params, batch.next_obs)
        next_a = self.smoothing(rng, next_dist.mode())
        nx = self.phi(batch.next_obs)
        next_q = jnp.minimum(
            *self._apply_twin(
                state.target_q1_params, state.target_q2_params, nx, next_a
            )
        )
        t = batch.reward + batch.discount * (
            1.0 - batch.is_terminal.astype(jnp.float32)
        ) * jax.lax.stop_gradient(next_q)
        x = self.phi(batch.obs)
        y1, y2 = self._apply_twin(q1_params, q2_params, x, batch.action)
        loss = compute_value_loss(y1, t, clip_delta=False) + compute_value_loss(
            y2, t, clip_delta=False
        )
        return loss, jnp.abs(y1 - t)

    def actor_loss(self, policy_params, state, batch):
        dist = self._policy_dist(policy_params, batch.obs)
        q = apply_cast(
            self.q_func1,
            state.q1_params,
            self.compute_dtype,
            self.phi(batch.obs),
            dist.mode(),
        )
        return -jnp.mean(q)

    def update(self, state: TD3State, rng, batch: TransitionBatch):
        rng_c, rng_a = jax.random.split(rng)
        (c_loss, errors), (g1, g2) = jax.value_and_grad(
            self.critic_losses, argnums=(0, 1), has_aux=True
        )(state.q1_params, state.q2_params, state, rng_c, batch)
        u1, o1 = self.q_func1_optimizer.update(g1, state.q1_opt_state, state.q1_params)
        u2, o2 = self.q_func2_optimizer.update(g2, state.q2_opt_state, state.q2_params)
        state = state.replace(
            q1_params=optax.apply_updates(state.q1_params, u1),
            q2_params=optax.apply_updates(state.q2_params, u2),
            q1_opt_state=o1,
            q2_opt_state=o2,
        )

        # Delayed policy + target update (td3.py:252-259): the step is
        # computed every call but selected in only on-cycle — branchless and
        # exactly equivalent to the reference's skipped updates (optimizer
        # moments are frozen off-cycle too).
        do_policy = (state.n_updates % self.policy_update_delay) == 0
        a_loss, p_grads = jax.value_and_grad(self.actor_loss)(
            state.policy_params, state, batch
        )
        pu, po = self.policy_optimizer.update(
            p_grads, state.policy_opt_state, state.policy_params
        )
        stepped = state.replace(
            policy_params=optax.apply_updates(state.policy_params, pu),
            policy_opt_state=po,
        )
        synced = self.sync_target(stepped)
        state = jax.tree.map(
            lambda a, b: jnp.where(do_policy, b, a), state, synced
        )
        state = state.replace(n_updates=state.n_updates + 1)
        return state, {
            "loss": c_loss,
            "actor_loss": a_loss,
            "errors": jax.lax.stop_gradient(errors),
        }

    def sync_target(self, state: TD3State) -> TD3State:
        tau = self.soft_update_tau
        return state.replace(
            target_policy_params=soft_copy_param(
                state.target_policy_params, state.policy_params, tau
            ),
            target_q1_params=soft_copy_param(
                state.target_q1_params, state.q1_params, tau
            ),
            target_q2_params=soft_copy_param(
                state.target_q2_params, state.q2_params, tau
            ),
        )


class TD3(ActorCriticShellAgent):
    """pfrl-protocol TD3 agent (td3.py:28-328)."""

    def __init__(
        self,
        policy,
        q_func1,
        q_func2,
        policy_optimizer,
        q_func1_optimizer,
        q_func2_optimizer,
        replay_buffer,
        gamma,
        explorer,
        *,
        action_space,
        gpu=None,
        replay_start_size=10000,
        minibatch_size=100,
        update_interval=1,
        phi=_identity,
        soft_update_tau=5e-3,
        n_times_update=1,
        update_burst=False,
        policy_update_delay=2,
        target_policy_smoothing_func=default_target_policy_smoothing_func,
        burnin_action_func=None,
        burnin_steps=0,
        compute_dtype=None,
        seed=0,
    ):
        del gpu
        core = TD3Core(
            policy=policy,
            q_func1=q_func1,
            q_func2=q_func2,
            policy_optimizer=policy_optimizer,
            q_func1_optimizer=q_func1_optimizer,
            q_func2_optimizer=q_func2_optimizer,
            explorer=explorer,
            gamma=gamma,
            soft_update_tau=soft_update_tau,
            policy_update_delay=policy_update_delay,
            target_policy_smoothing_func=target_policy_smoothing_func,
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
            n_times_update=n_times_update,
            update_burst=update_burst,
            seed=seed,
        )
        self.core_action_space = action_space
