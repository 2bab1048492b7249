"""Recurrent PPO — sequence-chunk minibatching with stored carries.

Reference parity: pfrl/agents/ppo.py:145-178 (``_yield_subset_of_sequences
_with_fixed_number_of_items`` — minibatches are whole sequence chunks) and
ppo.py:608-632 (``_update_recurrent``: losses recomputed by re-unrolling the
recurrent model from the stored recurrent state at each chunk start).

TPU-native form: the on-policy runner threads the policy carry through its
collect scan (resetting rows on ``done``), stores every step's pre-act
carry plus V(s_{t+1}) evaluated with the post-step carry, and the update
re-unrolls fixed-length chunks (``chunk_len`` | rollout length, so chunks
tile the rollout with no padding) from the stored chunk-start carries —
epochs x shuffled-chunk minibatches as two nested ``lax.scan``s, exactly
like the feedforward PPOCore but with a K-step unroll inside the loss.
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.ppo import PPOCore, PPOState, Rollout
from pfrl_tpu.ops.returns import gae_advantages
from pfrl_tpu.utils.precision import cast_floating, cast_to_float32
from pfrl_tpu.utils.pytree import tree_where


class RecurrentPPOCore(PPOCore):
    """model: ``apply(params, x[B,...], carry) -> ((dist, value), carry)``
    with ``initial_carry(batch_size)`` (pfrl_tpu.models.recurrent
    protocol); e.g. ``RecurrentSequential(Dense, tanh, LSTMCellModule,
    Branched(pi_head, v_head))``."""

    recurrent = True

    def __init__(self, *args, chunk_len: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.chunk_len = chunk_len

    # ----------------------------------------------------------------- setup
    def init(self, rng: jax.Array, example_obs, example_action=None) -> PPOState:
        del example_action
        batch = jax.tree.leaves(example_obs)[0].shape[0]
        carry = self.model.initial_carry(batch)
        params = self.model.init(rng, self.phi(example_obs), carry)
        return PPOState(
            params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def initial_carry(self, batch_size: int):
        return self.model.initial_carry(batch_size)

    def init_act_state(self, batch_size: int):
        return self.initial_carry(batch_size)

    def reset_act_state(self, carry, done):
        zero = jax.tree.map(jnp.zeros_like, carry)
        return tree_where(done, zero, carry)

    # ------------------------------------------------------------------- act
    def _forward_step(self, params, obs, carry):
        (dist, value), new_carry = self.model.apply(
            cast_floating(params, self.compute_dtype),
            cast_floating(self.phi(obs), self.compute_dtype),
            carry,
        )
        if self.compute_dtype is not None:
            # Outputs back to fp32 for loss/GAE math; the carry is kept
            # fp32 end-to-end (same contract as RecurrentDQNCore — the
            # fp32 carry input promotes the cell state).
            dist, value, new_carry = cast_to_float32(
                (dist, value, new_carry)
            )
        value = value[..., 0] if value.ndim > 1 else value
        return dist, value, new_carry

    def select_action_recurrent(self, state, rng, obs, t, training, carry):
        dist, _, new_carry = self._forward_step(state.params, obs, carry)
        a = dist.sample(rng) if training else dist.mode()
        return a, new_carry

    def act_with_aux_recurrent(self, state, rng, obs, training, carry):
        dist, value, new_carry = self._forward_step(state.params, obs, carry)
        action = dist.sample(rng) if training else dist.mode()
        aux = {"log_prob": dist.log_prob(action), "value": value}
        return action, aux, new_carry

    def value_recurrent(self, state, obs, carry):
        """V(obs) with an explicit carry — the runner evaluates V(s_{t+1})
        on the pre-reset next observation with the post-step carry, keeping
        GAE exact through truncation boundaries (same contract as the
        feedforward next-value forward, ppo.py:110-142)."""
        _, value, _ = self._forward_step(state.params, obs, carry)
        return value

    # ---------------------------------------------------------------- update
    def _chunk_loss(self, params, carry0, obs, action, done, old_lp, old_v, adv, v_target):
        """Unroll one minibatch of [mb, K] chunks from carry0 and apply the
        clipped-surrogate losses over every step (no padding: chunks tile
        the rollout)."""
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # [mb, K, ...] -> [K, mb, ...]
        xs = (
            jax.tree.map(tm, obs),
            tm(action),
            tm(done),
        )

        def body(carry, x):
            obs_t, act_t, done_t = x
            dist, value, new_carry = self._forward_step(params, obs_t, carry)
            lp = dist.log_prob(act_t)
            ent = dist.entropy()
            # Reset rows whose episode ended after this step, matching the
            # collection-time carry trajectory exactly.
            new_carry = self.reset_act_state(new_carry, done_t)
            return new_carry, (lp, ent, value)

        _, (log_prob, entropy, value) = jax.lax.scan(body, carry0, xs)
        log_prob, entropy, value = (
            tm(log_prob), tm(entropy), tm(value),
        )  # back to [mb, K]

        ratio = jnp.exp(log_prob - old_lp)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - self.clip_eps, 1 + self.clip_eps) * adv
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        if self.clip_eps_vf is None:
            value_loss = jnp.mean((value - v_target) ** 2)
        else:
            clipped_v = old_v + jnp.clip(
                value - old_v, -self.clip_eps_vf, self.clip_eps_vf
            )
            value_loss = jnp.mean(
                jnp.maximum((value - v_target) ** 2, (clipped_v - v_target) ** 2)
            )
        ent_mean = jnp.mean(entropy)
        loss = (
            policy_loss
            + self.value_func_coef * value_loss
            - self.entropy_coef * ent_mean
        )
        return loss, (policy_loss, value_loss, ent_mean)

    def update(self, state: PPOState, rng: jax.Array, rollout: Rollout):
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
        if self.standardize_advantages:
            advs = (advs - jnp.mean(advs)) / (jnp.std(advs) + 1e-8)

        # [T, B, ...] -> [N = (T/K)*B chunks, K, ...]
        def chunk(x):
            x = x.reshape((T // K, K) + x.shape[1:])       # [T/K, K, B, ...]
            x = jnp.moveaxis(x, 2, 1)                      # [T/K, B, K, ...]
            return x.reshape((T // K * B, K) + x.shape[3:])

        obs_c = jax.tree.map(chunk, rollout.obs)
        action_c = chunk(rollout.action)
        done_c = chunk(rollout.done)
        old_lp_c = chunk(rollout.log_prob)
        old_v_c = chunk(rollout.value)
        adv_c = chunk(advs)
        vt_c = chunk(v_targets)
        # Stored carry at each chunk start: rows t = 0, K, 2K, ...
        carry0_c = jax.tree.map(
            lambda x: x[::K].reshape((T // K * B,) + x.shape[2:]),
            rollout.carry,
        )

        n = T // K * B
        n_mb = max(1, n // self.minibatch_size)
        mb = self.minibatch_size if n >= self.minibatch_size else n

        def epoch_body(carry, rng_e):
            params, opt_state = carry
            perm = jax.random.permutation(rng_e, n)

            def mb_body(carry, idx):
                params, opt_state = carry
                take = lambda x: jax.tree.map(lambda l: l[idx], x)
                (loss, aux), grads = jax.value_and_grad(
                    self._chunk_loss, has_aux=True
                )(
                    params,
                    take(carry0_c),
                    take(obs_c),
                    action_c[idx],
                    done_c[idx],
                    old_lp_c[idx],
                    old_v_c[idx],
                    adv_c[idx],
                    vt_c[idx],
                )
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss,) + aux

            idxs = perm[: n_mb * mb].reshape(n_mb, mb)
            (params, opt_state), metrics = jax.lax.scan(
                mb_body, (params, opt_state), idxs
            )
            return (params, opt_state), metrics

        rngs = jax.random.split(rng, self.epochs)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (state.params, state.opt_state), rngs
        )
        loss, policy_loss, value_loss, entropy = jax.tree.map(jnp.mean, metrics)

        var_y = jnp.var(v_targets)
        explained_var = 1.0 - jnp.var(v_targets - rollout.value) / (var_y + 1e-8)

        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            n_updates=state.n_updates + self.epochs * n_mb,
        )
        return new_state, {
            "loss": loss,
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy,
            "explained_variance": explained_var,
            "errors": jnp.zeros((1,)),
        }
