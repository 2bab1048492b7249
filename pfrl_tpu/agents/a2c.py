"""A2C — synchronous advantage actor-critic.

Reference parity: pfrl/agents/a2c.py:14-294 (n-step rollout tensors
:110-148, returns/GAE recursion :150-167, joint pi/v/entropy loss
:169-199). The A3C of the reference is its asynchronous CPU twin; on TPU
the synchronous batched form is strictly better (SURVEY.md §2.6), so A3C
maps to this agent trained with many lanes (see pfrl_tpu/agents/a3c.py).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.ppo import OnPolicyShellAgent, PPOCore, PPOState, Rollout
from pfrl_tpu.ops.returns import discounted_returns, gae_advantages


def _identity(x):
    return x


class A2CCore(PPOCore):
    """Shares PPO's model protocol (obs -> (dist, value)); single full-batch
    gradient step per rollout, n-step bootstrapped returns."""

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        use_gae: bool = False,
        tau: float = 0.95,
        entropy_coeff: float = 0.01,
        v_loss_coef: float = 0.5,
        max_grad_norm: Optional[float] = None,
        phi: Callable = _identity,
        compute_dtype: Optional[Any] = None,
    ):
        super().__init__(
            model=model,
            optimizer=optimizer,
            gamma=gamma,
            lambd=tau,
            entropy_coef=entropy_coeff,
            value_func_coef=v_loss_coef,
            max_grad_norm=max_grad_norm,
            phi=phi,
            compute_dtype=compute_dtype,
        )
        self.use_gae = use_gae

    def update(self, state: PPOState, rng: jax.Array, rollout: Rollout):
        T, B = rollout.reward.shape
        flat_next = jax.tree.map(
            lambda x: x.reshape((T * B,) + x.shape[2:]), rollout.next_obs
        )
        _, next_values = self.forward(state.params, flat_next)
        next_values = next_values.reshape(T, B)

        if self.use_gae:
            advs, v_targets = gae_advantages(
                rollout.reward,
                rollout.value,
                next_values,
                rollout.terminated,
                rollout.done,
                self.gamma,
                self.lambd,
            )
        else:
            # n-step returns bootstrapped from V at boundaries and at the
            # rollout end (a2c.py:150-158).
            v_targets = discounted_returns(
                rollout.reward,
                rollout.terminated,
                next_values,
                self.gamma,
                done=rollout.done,
            )
            advs = v_targets - rollout.value

        def loss_fn(params):
            flat_obs = jax.tree.map(
                lambda x: x.reshape((T * B,) + x.shape[2:]), rollout.obs
            )
            dist, values = self.forward(params, flat_obs)
            log_probs = dist.log_prob(rollout.action.reshape(T * B))
            adv_flat = jax.lax.stop_gradient(advs.reshape(T * B))
            pg_loss = -jnp.mean(log_probs * adv_flat)
            v_loss = jnp.mean(
                (values - jax.lax.stop_gradient(v_targets.reshape(T * B))) ** 2
            )
            entropy = jnp.mean(dist.entropy())
            return (
                pg_loss
                + self.value_func_coef * v_loss
                - self.entropy_coef * entropy,
                (pg_loss, v_loss, entropy),
            )

        (loss, (pg, vl, ent)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = PPOState(
            params=params, opt_state=opt_state, n_updates=state.n_updates + 1
        )
        aux = {
            "loss": loss,
            "policy_loss": pg,
            "value_loss": vl,
            "entropy": ent,
            "errors": jnp.zeros((1,)),
        }
        return new_state, aux


class A2C(OnPolicyShellAgent):
    """pfrl-protocol A2C (a2c.py:14-294). ``update_steps`` is the
    reference's t_max (rollout length per lane)."""

    def __init__(
        self,
        model,
        optimizer,
        gamma: float,
        num_processes: int,
        *,
        gpu=None,
        update_steps: int = 5,
        phi=_identity,
        pi_loss_coef: float = 1.0,
        v_loss_coef: float = 0.5,
        entropy_coeff: float = 0.01,
        use_gae: bool = False,
        tau: float = 0.95,
        max_grad_norm=None,
        compute_dtype=None,
        seed: int = 0,
    ):
        del gpu, pi_loss_coef
        core = A2CCore(
            model=model,
            optimizer=optimizer,
            gamma=gamma,
            use_gae=use_gae,
            tau=tau,
            entropy_coeff=entropy_coeff,
            v_loss_coef=v_loss_coef,
            max_grad_norm=max_grad_norm,
            phi=phi,
            compute_dtype=compute_dtype,
        )
        super().__init__(
            core, update_interval=update_steps * num_processes, seed=seed
        )
