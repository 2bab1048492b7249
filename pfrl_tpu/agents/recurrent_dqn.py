"""Recurrent DQN (DRQN-style).

Reference parity: the recurrent mode of pfrl/agents/dqn.py:367-386 (episodic
replay + packed sequences + stored recurrent state) and the Recurrent
protocol (pfrl/nn/recurrent.py). TPU-native form: padded episodes from the
episodic device buffer, one ``lax.scan`` unroll per update for the online
and target nets (static shapes, masked loss — SURVEY.md §7 part (f)).
Act-time carry threads through the runner as explicit state.

Replay follows the reference's random-offset subsequence semantics
(pfrl/replay_buffer.py:149-154 random_subseq): the episodic buffer samples
windows at uniformly-random offsets and the update unrolls warm-start from
the behavior-time carry snapshots stored per transition
(pfrl/agents/dqn.py:533-543, pfrl/utils/recurrent.py:143-177) — the online
net from ``EpisodeBatch.init_carry`` (pre-step carry at the window start),
the target net from ``next_init_carry`` (post-step carry). Windows whose
buffer stored no carries fall back to zero carries (exact for windows at
t=0).
"""

import jax
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.dqn import DQNCore, DQNState
from pfrl_tpu.ops.value_loss import huber_loss
from pfrl_tpu.replay.episodic import EpisodeBatch
from pfrl_tpu.utils.precision import cast_floating, cast_to_float32
from pfrl_tpu.utils.pytree import tree_where


class RecurrentDQNCore(DQNCore):
    """model: ``apply(params, x[B,...], carry) -> (ActionValue, carry)`` with
    ``initial_carry(batch_size)`` (pfrl_tpu.models.recurrent protocol).

    ``burn_in``: R2D2-style burn-in (Kapturowski et al. 2019 — beyond the
    reference, which only warm-starts from the stored snapshot): the first
    ``burn_in`` steps of each replayed window are unrolled with CURRENT
    params under stop_gradient to refresh the possibly-stale stored carry,
    and the TD loss trains only on the remaining steps. Size replay
    windows as ``subseq_len = burn_in + train_len``.
    """

    recurrent = True
    #: update_episodic's aux["errors"] is one |TD| per sampled window —
    #: the runner may feed it into prioritized episodic trees.
    reports_window_errors = True

    def __init__(self, *args, burn_in: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        assert burn_in >= 0
        self.burn_in = burn_in

    def init(self, rng, example_obs, example_action=None) -> DQNState:
        del example_action
        rng_p, rng_n = jax.random.split(rng)
        x = self.phi(example_obs)
        batch = jax.tree.leaves(x)[0].shape[0]
        carry = self.initial_carry(batch)
        params = self.model.init({"params": rng_p, "noise": rng_n}, x, carry)
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def initial_carry(self, batch_size: int):
        return self.model.initial_carry(batch_size)

    def init_act_state(self, batch_size: int):
        return self.initial_carry(batch_size)

    # ------------------------------------------------------------------- act
    def select_action_recurrent(
        self, state: DQNState, rng, obs, t, training: bool, carry
    ):
        rng_noise, rng_explore = jax.random.split(rng)
        av, new_carry = self.model.apply(
            cast_floating(state.params, self.compute_dtype),
            cast_floating(self.phi(obs), self.compute_dtype),
            carry,
            rngs={"noise": rng_noise},
        )
        if self.compute_dtype is not None:
            # Q-values back to fp32; the carry stays fp32 because the model
            # received an fp32 carry (LSTM state promotes to the widest
            # input) — stored snapshots remain full precision either way.
            av = cast_to_float32(av)
            new_carry = cast_to_float32(new_carry)
        greedy = av.greedy_actions()
        if not training:
            return greedy, new_carry
        return self.explorer.select_action(rng_explore, t, greedy, av), new_carry

    def reset_act_state(self, carry, done):
        """Zero carry rows whose episode just ended."""
        zero = jax.tree.map(jnp.zeros_like, carry)
        return tree_where(done, zero, carry)

    # ---------------------------------------------------------------- update
    def _unroll(self, params, rng, obs_seq, B, carry0=None):
        """obs_seq: [B, T, ...] -> (stacked ActionValue over [T] (time-major
        scan), final carry).

        ``carry0``: warm-start carry (stored behavior-time snapshot at the
        window start); zeros when the buffer stored none.
        """
        xs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), obs_seq)  # [T, B, ...]
        if carry0 is None:
            carry0 = self.initial_carry(B)

        p = cast_floating(params, self.compute_dtype)

        def body(carry, x):
            av, carry = self.model.apply(
                p,
                cast_floating(self.phi(x), self.compute_dtype),
                carry,
                rngs={"noise": rng},
            )
            if self.compute_dtype is not None:
                av = cast_to_float32(av)
                carry = cast_to_float32(carry)
            return carry, av

        final_carry, avs = jax.lax.scan(body, carry0, xs)
        return avs, final_carry  # ActionValue leaves [T, B, ...]

    def update_episodic(self, state: DQNState, rng, batch: EpisodeBatch):
        tr = batch.transitions
        B, T = batch.mask.shape
        K = min(self.burn_in, T - 1) if self.burn_in else 0

        init_c = batch.init_carry
        tgt_c = batch.next_init_carry

        def _tail(x):
            return jax.tree.map(lambda v: v[:, K:], x) if K else x

        def loss_fn(params):
            rng_on, rng_tgt, rng_b1, rng_b2 = jax.random.split(rng, 4)
            on_c, tg_c = init_c, tgt_c
            if K:
                # Burn-in: refresh the stored carries by unrolling the
                # window prefix with current params, gradient stopped
                # (R2D2 semantics) — the loss trains only on the tail.
                burn = jax.tree.map(lambda v: v[:, :K], tr.obs)
                nburn = jax.tree.map(lambda v: v[:, :K], tr.next_obs)
                _, c = self._unroll(params, rng_b1, burn, B, on_c)
                on_c = jax.lax.stop_gradient(c)
                _, c = self._unroll(state.target_params, rng_b2, nburn, B, tg_c)
                tg_c = jax.lax.stop_gradient(c)
            avs, _ = self._unroll(params, rng_on, _tail(tr.obs), B, on_c)
            tgt_avs, _ = self._unroll(
                state.target_params, rng_tgt, _tail(tr.next_obs), B, tg_c
            )
            q = avs.evaluate_actions(jnp.swapaxes(_tail(tr.action), 0, 1))
            max_next = jax.lax.stop_gradient(tgt_avs.max())        # [T-K,B]
            r = jnp.swapaxes(_tail(tr.reward), 0, 1)
            term = jnp.swapaxes(_tail(tr.terminated), 0, 1).astype(jnp.float32)
            target = r + self.gamma * (1.0 - term) * max_next
            diff = q - jax.lax.stop_gradient(target)
            per = huber_loss(diff) if self.clip_delta else 0.5 * diff * diff
            m = jnp.swapaxes(_tail(batch.mask), 0, 1)
            if self.batch_accumulator == "mean":
                loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
            else:
                loss = jnp.sum(per * m) / B
            # Per-window |TD| (masked mean over trained steps): the
            # prioritized episodic buffer's priority feedback signal
            # (reference per-episode update_errors loop).
            win_err = jnp.sum(jnp.abs(diff) * m, axis=0) / jnp.maximum(
                jnp.sum(m, axis=0), 1.0
            )
            return loss, (jnp.mean(q * m), win_err)

        (loss, (q_mean, win_err)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, n_updates=state.n_updates + 1
        )
        return new_state, {
            "loss": loss,
            "average_q": q_mean,
            "errors": jax.lax.stop_gradient(win_err),
        }
