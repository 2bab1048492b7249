"""Soft Actor-Critic with learnable temperature.

Reference parity: pfrl/agents/soft_actor_critic.py:42-385 — twin soft-Q
critics (:214-262), TemperatureHolder + temperature loss (:24-39, 264-271),
reparameterized policy update (:273-308). All three gradient steps fuse into
one jitted update.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pfrl_tpu.agents.ddpg import ActorCriticShellAgent, _identity
from pfrl_tpu.ops.value_loss import compute_value_loss
from pfrl_tpu.replay.transition import TransitionBatch
from pfrl_tpu.utils.copy_param import soft_copy_param
from pfrl_tpu.utils.precision import apply_cast, cast_floating, cast_to_float32


def _twin_compatible(p1, p2) -> bool:
    """True when two param trees share structure, shapes, and dtypes —
    i.e. the twin critics are the same architecture and can be evaluated
    as one vmapped stacked apply (see ``_apply_twin``)."""
    try:
        eq = jax.tree.map(
            lambda a, b: a.shape == b.shape and a.dtype == b.dtype, p1, p2
        )
    except ValueError:
        return False
    return all(jax.tree.leaves(eq))


def _stack_pair(t1, t2):
    return jax.tree.map(lambda a, b: jnp.stack([a, b]), t1, t2)


@struct.dataclass
class SACState:
    policy_params: Any
    q1_params: Any
    q2_params: Any
    target_q1_params: Any
    target_q2_params: Any
    policy_opt_state: Any
    q1_opt_state: Any
    q2_opt_state: Any
    log_temperature: jax.Array
    temperature_opt_state: Any
    n_updates: jax.Array


class SACCore:
    def __init__(
        self,
        policy,                      # module: obs -> SquashedNormal
        q_func1,
        q_func2,
        policy_optimizer: optax.GradientTransformation,
        q_func1_optimizer: optax.GradientTransformation,
        q_func2_optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        soft_update_tau: float = 5e-3,
        temperature_optimizer: Optional[optax.GradientTransformation] = None,
        initial_temperature: float = 1.0,
        entropy_target: Optional[float] = None,
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
        self.gamma = gamma
        self.soft_update_tau = soft_update_tau
        self.temperature_optimizer = temperature_optimizer or optax.adam(3e-4)
        self.initial_temperature = initial_temperature
        self.entropy_target = entropy_target
        self.learn_temperature = entropy_target is not None
        self.phi = phi
        self.burnin_action_func = burnin_action_func
        self.burnin_steps = burnin_steps
        self.target_update_method = "soft"
        self.explorer = None
        self._twin_fused = False
        # Mixed precision (TPU-native; see utils/precision.py): bf16
        # policy/critic applies over fp32 masters. The temperature, soft
        # Bellman targets, log-probs, and losses stay fp32 (the policy's
        # tanh-squash log-prob comes back up-cast before any loss math).
        self.compute_dtype = compute_dtype

    def init(self, rng, example_obs, example_action) -> SACState:
        rng_p, rng_q1, rng_q2 = jax.random.split(rng, 3)
        x = self.phi(example_obs)
        policy_params = self.policy.init(rng_p, x)
        q1 = self.q_func1.init(rng_q1, x, example_action)
        q2 = self.q_func2.init(rng_q2, x, example_action)
        self._twin_fused = _twin_compatible(q1, q2)
        log_temp = jnp.asarray(jnp.log(self.initial_temperature), jnp.float32)
        return SACState(
            policy_params=policy_params,
            q1_params=q1,
            q2_params=q2,
            target_q1_params=q1,
            target_q2_params=q2,
            policy_opt_state=self.policy_optimizer.init(policy_params),
            q1_opt_state=self.q_func1_optimizer.init(q1),
            q2_opt_state=self.q_func2_optimizer.init(q2),
            log_temperature=log_temp,
            temperature_opt_state=self.temperature_optimizer.init(log_temp),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def _policy_dist(self, params, obs):
        return apply_cast(self.policy, params, self.compute_dtype, self.phi(obs))

    def select_action(self, state, rng, obs, t, training: bool):
        dist = self._policy_dist(state.policy_params, obs)
        if not training:
            return dist.mode()
        rng_s, rng_burn = jax.random.split(rng)
        a = dist.sample(rng_s)
        if self.burnin_action_func is not None and self.burnin_steps > 0:
            burn = self.burnin_action_func(
                rng_burn, jax.tree.leaves(obs)[0].shape[0]
            )
            a = jnp.where(t < self.burnin_steps, burn, a)
        return a

    # ---------------------------------------------------------------- update
    def _apply_twin(self, p1, p2, x, a):
        """Evaluate both critics; one vmapped stacked apply when fused.

        With identical twin architectures the pair of [B] MLP applies
        becomes a single [2, B] batched apply over stacked params — XLA
        lowers each Dense to one batched matmul, halving the critic-path
        op count (the SAC/TD3 update at MuJoCo shapes is op-count-bound,
        not FLOP-bound, on TPU).
        """
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
        """Soft Bellman targets (soft_actor_critic.py:214-262)."""
        next_dist = self._policy_dist(state.policy_params, batch.next_obs)
        next_a, next_log_pi = next_dist.sample_and_log_prob(rng)
        temp = jnp.exp(state.log_temperature)
        nx = self.phi(batch.next_obs)
        next_q = jnp.minimum(
            *self._apply_twin(
                state.target_q1_params, state.target_q2_params, nx, next_a
            )
        )
        entropy_term = temp * next_log_pi
        t = batch.reward + batch.discount * (
            1.0 - batch.is_terminal.astype(jnp.float32)
        ) * jax.lax.stop_gradient(next_q - entropy_term)
        x = self.phi(batch.obs)
        y1, y2 = self._apply_twin(q1_params, q2_params, x, batch.action)
        loss = compute_value_loss(y1, t, clip_delta=False) + compute_value_loss(
            y2, t, clip_delta=False
        )
        return loss, jnp.abs(y1 - t)

    def actor_and_temp_loss(self, policy_params, log_temp, state, rng, batch):
        """rsample policy loss + temperature loss
        (soft_actor_critic.py:264-308)."""
        dist = self._policy_dist(policy_params, batch.obs)
        a, log_pi = dist.sample_and_log_prob(rng)
        x = self.phi(batch.obs)
        q = jnp.minimum(
            *self._apply_twin(state.q1_params, state.q2_params, x, a)
        )
        temp = jax.lax.stop_gradient(jnp.exp(log_temp))
        actor_loss = jnp.mean(temp * log_pi - q)
        if self.learn_temperature:
            temp_loss = -jnp.mean(
                log_temp
                * jax.lax.stop_gradient(log_pi + self.entropy_target)
            )
        else:
            temp_loss = jnp.zeros(())
        return actor_loss + temp_loss, (actor_loss, temp_loss, -jnp.mean(log_pi))

    def update(self, state: SACState, rng, batch: TransitionBatch):
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

        (total, (a_loss, t_loss, entropy)), (p_grads, temp_grad) = (
            jax.value_and_grad(self.actor_and_temp_loss, argnums=(0, 1), has_aux=True)(
                state.policy_params, state.log_temperature, state, rng_a, batch
            )
        )
        pu, po = self.policy_optimizer.update(
            p_grads, state.policy_opt_state, state.policy_params
        )
        state = state.replace(
            policy_params=optax.apply_updates(state.policy_params, pu),
            policy_opt_state=po,
        )
        if self.learn_temperature:
            tu, to = self.temperature_optimizer.update(
                temp_grad, state.temperature_opt_state, state.log_temperature
            )
            state = state.replace(
                log_temperature=optax.apply_updates(state.log_temperature, tu),
                temperature_opt_state=to,
            )
        state = self.sync_target(state)
        state = state.replace(n_updates=state.n_updates + 1)
        return state, {
            "loss": c_loss,
            "actor_loss": a_loss,
            "temperature_loss": t_loss,
            "entropy": entropy,
            "temperature": jnp.exp(state.log_temperature),
            "errors": jax.lax.stop_gradient(errors),
        }

    def sync_target(self, state: SACState) -> SACState:
        tau = self.soft_update_tau
        return state.replace(
            target_q1_params=soft_copy_param(
                state.target_q1_params, state.q1_params, tau
            ),
            target_q2_params=soft_copy_param(
                state.target_q2_params, state.q2_params, tau
            ),
        )


class SoftActorCritic(ActorCriticShellAgent):
    """pfrl-protocol SAC agent (soft_actor_critic.py:42-385)."""

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
        temperature_optimizer_lr=None,
        initial_temperature=1.0,
        entropy_target=None,
        burnin_action_func=None,
        burnin_steps=0,
        compute_dtype=None,
        seed=0,
    ):
        del gpu
        if entropy_target is None:
            entropy_target = -float(action_space.shape[0])
        core = SACCore(
            policy=policy,
            q_func1=q_func1,
            q_func2=q_func2,
            policy_optimizer=policy_optimizer,
            q_func1_optimizer=q_func1_optimizer,
            q_func2_optimizer=q_func2_optimizer,
            gamma=gamma,
            soft_update_tau=soft_update_tau,
            temperature_optimizer=(
                optax.adam(temperature_optimizer_lr)
                if temperature_optimizer_lr is not None
                else None
            ),
            initial_temperature=initial_temperature,
            entropy_target=entropy_target,
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
