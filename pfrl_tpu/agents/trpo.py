"""TRPO — trust-region policy optimization.

Reference parity: pfrl/agents/trpo.py:90-844 — policy step via conjugate
gradient on Fisher-vector products from the KL Hessian (:557-598),
backtracking line search (:599+), separate SGD value function (:387-413),
PPO-style GAE dataset (trpo.py:12-18 reuses ppo machinery).

TPU-native form (SURVEY.md §7 hard part (d)): parameters are raveled to a
flat vector (jax.flatten_util), the CG loop is a fixed-budget
``lax.fori_loop`` (pfrl_tpu/utils/conjugate_gradient.py), FVPs are
jvp-of-grad-of-KL (double AD, one fused XLA program), and the backtracking
line search is a branchless ``lax.fori_loop`` that keeps the first
acceptable candidate — the whole policy update is ONE jitted call.

No ``compute_dtype`` here by design: the FVP/CG/KL second-order math is
precision sensitive (bf16 curvature products destabilize the CG
residual), so TRPO trains fp32 while the first-order families take
``compute_dtype=jnp.bfloat16`` (utils/precision.py).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from pfrl_tpu.agents.ppo import OnPolicyShellAgent, Rollout
from pfrl_tpu.ops.returns import gae_advantages
from pfrl_tpu.utils.conjugate_gradient import conjugate_gradient


def _identity(x):
    return x


@struct.dataclass
class TRPOState:
    policy_params: Any
    vf_params: Any
    vf_opt_state: Any
    n_updates: jax.Array


class TRPOCore:
    def __init__(
        self,
        policy,                      # obs -> Distribution
        vf,                          # obs -> value
        vf_optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        lambd: float = 0.95,
        entropy_coef: float = 0.0,
        max_kl: float = 0.01,
        vf_epochs: int = 3,
        vf_batch_size: int = 64,
        conjugate_gradient_max_iter: int = 10,
        conjugate_gradient_damping: float = 1e-1,
        line_search_max_backtrack: int = 10,
        standardize_advantages: bool = True,
        phi: Callable = _identity,
    ):
        self.policy = policy
        self.vf = vf
        self.vf_optimizer = vf_optimizer
        self.gamma = gamma
        self.lambd = lambd
        self.entropy_coef = entropy_coef
        self.max_kl = max_kl
        self.vf_epochs = vf_epochs
        self.vf_batch_size = vf_batch_size
        self.cg_max_iter = conjugate_gradient_max_iter
        self.cg_damping = conjugate_gradient_damping
        self.max_backtrack = line_search_max_backtrack
        self.standardize_advantages = standardize_advantages
        self.phi = phi

    # ----------------------------------------------------------------- setup
    def init(self, rng, example_obs, example_action=None) -> TRPOState:
        del example_action
        rng_p, rng_v = jax.random.split(rng)
        x = self.phi(example_obs)
        policy_params = self.policy.init(rng_p, x)
        vf_params = self.vf.init(rng_v, x)
        return TRPOState(
            policy_params=policy_params,
            vf_params=vf_params,
            vf_opt_state=self.vf_optimizer.init(vf_params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def forward(self, state_or_params, obs):
        params = (
            state_or_params.policy_params
            if isinstance(state_or_params, TRPOState)
            else state_or_params
        )
        dist = self.policy.apply(params, self.phi(obs))
        return dist

    def value(self, vf_params, obs):
        v = self.vf.apply(vf_params, self.phi(obs))
        return v[..., 0] if v.ndim > 1 else v

    def select_action(self, state, rng, obs, t, training: bool):
        dist = self.forward(state, obs)
        return dist.sample(rng) if training else dist.mode()

    def act_with_aux(self, state, rng, obs, training: bool = True):
        dist = self.forward(state, obs)
        action = dist.sample(rng) if training else dist.mode()
        return action, {
            "log_prob": dist.log_prob(action),
            "value": self.value(state.vf_params, obs),
        }

    # ---------------------------------------------------------------- update
    def update(self, state: TRPOState, rng: jax.Array, rollout: Rollout):
        T, B = rollout.reward.shape
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        flat_next = jax.tree.map(flat, rollout.next_obs)
        next_values = self.value(state.vf_params, flat_next).reshape(T, B)
        advs, v_targets = gae_advantages(
            rollout.reward,
            rollout.value,
            next_values,
            rollout.terminated,
            rollout.done,
            self.gamma,
            self.lambd,
        )
        obs = jax.tree.map(flat, rollout.obs)
        actions = flat(rollout.action)
        old_lp = flat(rollout.log_prob)
        adv = flat(advs)
        if self.standardize_advantages:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        vt = flat(v_targets)

        new_policy, policy_metrics = self._policy_step(
            state.policy_params, obs, actions, old_lp, adv
        )
        new_vf, new_vf_opt, vf_loss = self._vf_fit(
            state.vf_params, state.vf_opt_state, rng, obs, vt
        )
        new_state = TRPOState(
            policy_params=new_policy,
            vf_params=new_vf,
            vf_opt_state=new_vf_opt,
            n_updates=state.n_updates + 1,
        )
        aux = dict(policy_metrics)
        aux.update({"value_loss": vf_loss, "loss": policy_metrics["policy_loss"],
                    "errors": jnp.zeros((1,))})
        return new_state, aux

    # -------------------------------------------------- policy (CG + search)
    def _policy_step(self, policy_params, obs, actions, old_lp, adv):
        flat0, unravel = ravel_pytree(policy_params)

        def surrogate(flat_params):
            dist = self.policy.apply(unravel(flat_params), self.phi(obs))
            ratio = jnp.exp(dist.log_prob(actions) - old_lp)
            gain = jnp.mean(ratio * adv)
            if self.entropy_coef:
                gain = gain + self.entropy_coef * jnp.mean(dist.entropy())
            return gain

        def mean_kl(flat_params):
            # KL(old || new) with old = current params, detached.
            old_dist = self.policy.apply(
                unravel(jax.lax.stop_gradient(flat0)), self.phi(obs)
            )
            new_dist = self.policy.apply(unravel(flat_params), self.phi(obs))
            return jnp.mean(old_dist.kl(new_dist))

        gain0, g = jax.value_and_grad(surrogate)(flat0)

        def fvp(v):
            # Hessian-vector product of the KL at flat0 + damping.
            hv = jax.jvp(jax.grad(mean_kl), (flat0,), (v,))[1]
            return hv + self.cg_damping * v

        step_dir = conjugate_gradient(fvp, g, max_iter=self.cg_max_iter)
        shs = jnp.vdot(step_dir, fvp(step_dir))
        scale = jnp.sqrt(2.0 * self.max_kl / jnp.maximum(shs, 1e-12))
        full_step = scale * step_dir

        # Backtracking line search (trpo.py:599+): first candidate with
        # improved surrogate AND kl <= max_kl wins; fall back to no step.
        def body(i, carry):
            accepted, best = carry
            candidate = flat0 + full_step * (0.5**i)
            gain = surrogate(candidate)
            kl = mean_kl(candidate)
            ok = (gain > gain0) & (kl <= self.max_kl) & ~accepted
            best = jnp.where(ok, candidate, best)
            return (accepted | ok, best)

        accepted, best = jax.lax.fori_loop(
            0, self.max_backtrack, body, (jnp.zeros((), bool), flat0)
        )
        new_params = unravel(best)
        return new_params, {
            "policy_loss": -gain0,
            "kl": mean_kl(best),
            "step_accepted": accepted.astype(jnp.float32),
            "entropy": jnp.mean(
                self.policy.apply(policy_params, self.phi(obs)).entropy()
            ),
        }

    # -------------------------------------------------------------- vf fit
    def _vf_fit(self, vf_params, vf_opt_state, rng, obs, v_targets):
        n = v_targets.shape[0]
        mb = min(self.vf_batch_size, n)
        n_mb = max(1, n // mb)

        def epoch(carry, rng_e):
            params, opt_state = carry
            perm = jax.random.permutation(rng_e, n)[: n_mb * mb].reshape(n_mb, mb)

            def step(carry, idx):
                params, opt_state = carry

                def loss_fn(p):
                    take = jax.tree.map(lambda l: l[idx], obs)
                    v = self.value(p, take)
                    return jnp.mean((v - v_targets[idx]) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.vf_optimizer.update(
                    grads, opt_state, params
                )
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), perm
            )
            return (params, opt_state), jnp.mean(losses)

        rngs = jax.random.split(rng, self.vf_epochs)
        (params, opt_state), losses = jax.lax.scan(
            epoch, (vf_params, vf_opt_state), rngs
        )
        return params, opt_state, jnp.mean(losses)


class TRPO(OnPolicyShellAgent):
    """pfrl-protocol TRPO (trpo.py:90-844)."""

    def __init__(
        self,
        policy,
        vf,
        vf_optimizer,
        *,
        gpu=None,
        gamma: float = 0.99,
        lambd: float = 0.95,
        phi=_identity,
        entropy_coef: float = 0.0,
        update_interval: int = 2048,
        max_kl: float = 0.01,
        vf_epochs: int = 3,
        vf_batch_size: int = 64,
        standardize_advantages: bool = True,
        line_search_max_backtrack: int = 10,
        conjugate_gradient_max_iter: int = 10,
        conjugate_gradient_damping: float = 1e-1,
        seed: int = 0,
    ):
        del gpu
        core = TRPOCore(
            policy=policy,
            vf=vf,
            vf_optimizer=vf_optimizer,
            gamma=gamma,
            lambd=lambd,
            entropy_coef=entropy_coef,
            max_kl=max_kl,
            vf_epochs=vf_epochs,
            vf_batch_size=vf_batch_size,
            conjugate_gradient_max_iter=conjugate_gradient_max_iter,
            conjugate_gradient_damping=conjugate_gradient_damping,
            line_search_max_backtrack=line_search_max_backtrack,
            standardize_advantages=standardize_advantages,
            phi=phi,
        )
        super().__init__(core, update_interval=update_interval, seed=seed)
