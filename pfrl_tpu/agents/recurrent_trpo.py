"""Recurrent TRPO — trust-region step over sequence-chunk unrolls.

Reference parity: pfrl/agents/trpo.py with ``recurrent=True`` reuses PPO's
recurrent dataset machinery (trpo.py:12-18; ppo.py:145-178 sequence-chunk
minibatches, ppo.py:608-632 re-unroll from stored recurrent state). The
reference computes the surrogate gain, the KL (against the pre-step
distribution), the Fisher-vector products, and the line-search evaluations
all through packed-sequence forwards of the recurrent policy.

TPU-native form: the on-policy runner stores each step's pre-act carry
(pfrl_tpu/experiments/onpolicy_runner.py); the update re-unrolls
fixed-length chunks (``chunk_len`` | rollout length, so chunks tile the
rollout with no padding) from the stored chunk-start carries with one
``lax.scan`` that returns the *stacked distribution pytree* — surrogate,
KL, its grad, the jvp-of-grad FVPs, and every backtracking candidate all
differentiate through that same scan, so the whole policy step stays ONE
jitted call exactly like the feedforward TRPOCore.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from pfrl_tpu.agents.ppo import Rollout
from pfrl_tpu.agents.trpo import TRPOCore, TRPOState
from pfrl_tpu.ops.returns import gae_advantages
from pfrl_tpu.utils.conjugate_gradient import conjugate_gradient
from pfrl_tpu.utils.pytree import tree_where


class RecurrentTRPOCore(TRPOCore):
    """TRPO over recurrent policy and value networks.

    ``policy``/``vf`` follow the recurrent-module protocol
    (pfrl_tpu.models.recurrent): ``apply(params, x[B, ...], carry) ->
    (out, carry')`` plus ``initial_carry(batch_size)``. The act-state carry
    threaded by the runner is the pair ``(policy_carry, vf_carry)``.
    """

    recurrent = True

    def __init__(self, *args, chunk_len: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.chunk_len = chunk_len

    # ----------------------------------------------------------------- setup
    def init(self, rng, example_obs, example_action=None) -> TRPOState:
        del example_action
        rng_p, rng_v = jax.random.split(rng)
        batch = jax.tree.leaves(example_obs)[0].shape[0]
        x = self.phi(example_obs)
        policy_params = self.policy.init(
            rng_p, x, self.policy.initial_carry(batch)
        )
        vf_params = self.vf.init(rng_v, x, self.vf.initial_carry(batch))
        return TRPOState(
            policy_params=policy_params,
            vf_params=vf_params,
            vf_opt_state=self.vf_optimizer.init(vf_params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def initial_carry(self, batch_size: int):
        return (
            self.policy.initial_carry(batch_size),
            self.vf.initial_carry(batch_size),
        )

    def init_act_state(self, batch_size: int):
        return self.initial_carry(batch_size)

    def reset_act_state(self, carry, done):
        zero = jax.tree.map(jnp.zeros_like, carry)
        return tree_where(done, zero, carry)

    # ------------------------------------------------------------------- act
    def _policy_step_fwd(self, policy_params, obs, pi_carry):
        dist, new_carry = self.policy.apply(
            policy_params, self.phi(obs), pi_carry
        )
        return dist, new_carry

    def _vf_step_fwd(self, vf_params, obs, vf_carry):
        v, new_carry = self.vf.apply(vf_params, self.phi(obs), vf_carry)
        v = v[..., 0] if v.ndim > 1 else v
        return v, new_carry

    def select_action_recurrent(self, state, rng, obs, t, training, carry):
        pi_carry, vf_carry = carry
        dist, pi_carry = self._policy_step_fwd(state.policy_params, obs, pi_carry)
        # Keep the vf carry in step even when only acting (eval path).
        _, vf_carry = self._vf_step_fwd(state.vf_params, obs, vf_carry)
        a = dist.sample(rng) if training else dist.mode()
        return a, (pi_carry, vf_carry)

    def act_with_aux_recurrent(self, state, rng, obs, training, carry):
        pi_carry, vf_carry = carry
        dist, pi_carry = self._policy_step_fwd(state.policy_params, obs, pi_carry)
        value, vf_carry = self._vf_step_fwd(state.vf_params, obs, vf_carry)
        action = dist.sample(rng) if training else dist.mode()
        aux = {"log_prob": dist.log_prob(action), "value": value}
        return action, aux, (pi_carry, vf_carry)

    def value_recurrent(self, state, obs, carry):
        """V(s_{t+1}) with the post-step vf carry (same contract as
        RecurrentPPOCore.value_recurrent)."""
        _, vf_carry = carry
        value, _ = self._vf_step_fwd(state.vf_params, obs, vf_carry)
        return value

    # -------------------------------------------------------------- unrolls
    def _unroll_policy(self, policy_params, pi_carry0, obs_c, done_c):
        """[N, K] chunk unroll -> stacked distribution pytree with leading
        [N, K] batch axes. Carries reset on done rows, matching the
        collection-time trajectory."""
        tm = lambda x: jnp.swapaxes(x, 0, 1)
        xs = (jax.tree.map(tm, obs_c), tm(done_c))

        def body(carry, x):
            obs_t, done_t = x
            dist, new_carry = self._policy_step_fwd(policy_params, obs_t, carry)
            new_carry = self.reset_act_state(new_carry, done_t)
            return new_carry, dist

        _, dists = jax.lax.scan(body, pi_carry0, xs)
        return jax.tree.map(tm, dists)  # [K, N, ...] -> [N, K, ...]

    def _unroll_vf(self, vf_params, vf_carry0, obs_c, done_c):
        tm = lambda x: jnp.swapaxes(x, 0, 1)
        xs = (jax.tree.map(tm, obs_c), tm(done_c))

        def body(carry, x):
            obs_t, done_t = x
            v, new_carry = self._vf_step_fwd(vf_params, obs_t, carry)
            new_carry = self.reset_act_state(new_carry, done_t)
            return new_carry, v

        _, values = jax.lax.scan(body, vf_carry0, xs)
        return tm(values)  # [N, K]

    # ---------------------------------------------------------------- update
    def update(self, state: TRPOState, rng: jax.Array, rollout: Rollout):
        T, B = rollout.reward.shape
        K = self.chunk_len
        assert T % K == 0, f"chunk_len {K} must divide rollout length {T}"
        advs, v_targets = gae_advantages(
            rollout.reward,
            rollout.value,
            rollout.next_value,
            rollout.terminated,
            rollout.done,
            self.gamma,
            self.lambd,
        )
        adv_flat = advs.reshape(-1)
        if self.standardize_advantages:
            advs = (advs - jnp.mean(adv_flat)) / (jnp.std(adv_flat) + 1e-8)

        # [T, B, ...] -> [N = (T/K)*B chunks, K, ...]
        def chunk(x):
            x = x.reshape((T // K, K) + x.shape[1:])
            x = jnp.moveaxis(x, 2, 1)
            return x.reshape((T // K * B, K) + x.shape[3:])

        obs_c = jax.tree.map(chunk, rollout.obs)
        action_c = chunk(rollout.action)
        done_c = chunk(rollout.done)
        old_lp_c = chunk(rollout.log_prob)
        adv_c = chunk(advs)
        vt_c = chunk(v_targets)
        # Stored carries at chunk starts: rows t = 0, K, 2K, ...
        carry0 = jax.tree.map(
            lambda x: x[::K].reshape((T // K * B,) + x.shape[2:]),
            rollout.carry,
        )
        pi_carry0, vf_carry0 = carry0

        new_policy, policy_metrics = self._policy_trust_region_step(
            state.policy_params, pi_carry0, obs_c, action_c, done_c,
            old_lp_c, adv_c,
        )
        new_vf, new_vf_opt, vf_loss = self._vf_fit_chunks(
            state.vf_params, state.vf_opt_state, rng,
            vf_carry0, obs_c, done_c, vt_c,
        )
        new_state = TRPOState(
            policy_params=new_policy,
            vf_params=new_vf,
            vf_opt_state=new_vf_opt,
            n_updates=state.n_updates + 1,
        )
        aux = dict(policy_metrics)
        aux.update({
            "value_loss": vf_loss,
            "loss": policy_metrics["policy_loss"],
            "errors": jnp.zeros((1,)),
        })
        return new_state, aux

    # -------------------------------------------------- policy (CG + search)
    def _policy_trust_region_step(
        self, policy_params, pi_carry0, obs_c, action_c, done_c, old_lp_c, adv_c
    ):
        flat0, unravel = ravel_pytree(policy_params)

        def dists_of(flat_params):
            return self._unroll_policy(
                unravel(flat_params), pi_carry0, obs_c, done_c
            )

        def surrogate(flat_params):
            dist = dists_of(flat_params)
            ratio = jnp.exp(dist.log_prob(action_c) - old_lp_c)
            gain = jnp.mean(ratio * adv_c)
            if self.entropy_coef:
                gain = gain + self.entropy_coef * jnp.mean(dist.entropy())
            return gain

        old_dist = jax.tree.map(
            jax.lax.stop_gradient, dists_of(flat0)
        )

        def mean_kl(flat_params):
            new_dist = dists_of(flat_params)
            return jnp.mean(old_dist.kl(new_dist))

        gain0, g = jax.value_and_grad(surrogate)(flat0)

        def fvp(v):
            hv = jax.jvp(jax.grad(mean_kl), (flat0,), (v,))[1]
            return hv + self.cg_damping * v

        step_dir = conjugate_gradient(fvp, g, max_iter=self.cg_max_iter)
        shs = jnp.vdot(step_dir, fvp(step_dir))
        scale = jnp.sqrt(2.0 * self.max_kl / jnp.maximum(shs, 1e-12))
        full_step = scale * step_dir

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
            "entropy": jnp.mean(dists_of(best).entropy()),
        }

    # -------------------------------------------------------------- vf fit
    def _vf_fit_chunks(
        self, vf_params, vf_opt_state, rng, vf_carry0, obs_c, done_c, vt_c
    ):
        n = vt_c.shape[0]
        mb = min(self.vf_batch_size, n)
        n_mb = max(1, n // mb)

        def epoch(carry, rng_e):
            params, opt_state = carry
            perm = jax.random.permutation(rng_e, n)[: n_mb * mb].reshape(n_mb, mb)

            def step(carry, idx):
                params, opt_state = carry

                def loss_fn(p):
                    take = lambda x: jax.tree.map(lambda l: l[idx], x)
                    v = self._unroll_vf(
                        p, take(vf_carry0), take(obs_c), done_c[idx]
                    )
                    return jnp.mean((v - vt_c[idx]) ** 2)

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
