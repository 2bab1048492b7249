"""Recurrent IQN (DRQN-style implicit quantile agent).

Reference parity: pfrl/agents/iqn.py:127-173 (recurrent IQN model) combined
with the recurrent mode of pfrl/agents/dqn.py:367-386 (episodic replay +
stored carries). TPU-native form mirrors RecurrentDQNCore: padded episodes
from the episodic device buffer, ``lax.scan`` unrolls with masked quantile
Huber loss, per-step iid taus drawn by folding the update rng with the time
index (static shapes throughout).
"""

import jax
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.dqn import DQNState
from pfrl_tpu.agents.recurrent_dqn import RecurrentDQNCore
from pfrl_tpu.ops.quantile import eltwise_huber_quantile_loss
from pfrl_tpu.replay.episodic import EpisodeBatch
from pfrl_tpu.utils.precision import cast_floating, cast_to_float32


class RecurrentIQNCore(RecurrentDQNCore):
    """model: ``apply(params, x, taus, carry) -> (QuantileActionValue, carry)``
    with ``initial_carry(batch_size)`` — e.g.
    :class:`pfrl_tpu.q_functions.RecurrentImplicitQuantileQFunction`."""

    def __init__(
        self,
        *args,
        quantile_thresholds_N: int = 64,
        quantile_thresholds_N_prime: int = 64,
        quantile_thresholds_K: int = 32,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.N = quantile_thresholds_N
        self.N_prime = quantile_thresholds_N_prime
        self.K = quantile_thresholds_K

    def init(self, rng, example_obs, example_action=None) -> DQNState:
        del example_action
        rng_p, rng_n = jax.random.split(rng)
        x = self.phi(example_obs)
        batch = jax.tree.leaves(x)[0].shape[0]
        taus = jnp.zeros((batch, self.K), jnp.float32)
        carry = self.initial_carry(batch)
        params = self.model.init(
            {"params": rng_p, "noise": rng_n}, x, taus, carry
        )
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def select_action_recurrent(
        self, state: DQNState, rng, obs, t, training: bool, carry
    ):
        rng_noise, rng_tau, rng_explore = jax.random.split(rng, 3)
        x = self.phi(obs)
        batch = jax.tree.leaves(x)[0].shape[0]
        if training:
            taus = jax.random.uniform(rng_tau, (batch, self.K))
        else:
            # Deterministic eval grid (iqn.py:416-433).
            taus = jnp.broadcast_to(
                (jnp.arange(self.K, dtype=jnp.float32) + 0.5) / self.K,
                (batch, self.K),
            )
        av, new_carry = self.model.apply(
            cast_floating(state.params, self.compute_dtype),
            cast_floating(x, self.compute_dtype),
            taus,
            carry,
            rngs={"noise": rng_noise},
        )
        if self.compute_dtype is not None:
            av = cast_to_float32(av)
            new_carry = cast_to_float32(new_carry)
        greedy = av.greedy_actions()
        if not training:
            return greedy, new_carry
        return (
            self.explorer.select_action(rng_explore, t, greedy, av),
            new_carry,
        )

    # ---------------------------------------------------------------- update
    def _unroll_quantiles(self, params, rng, obs_seq, B, n_taus, carry0=None):
        """obs_seq: [B, T, ...] -> (quantiles [T, B, n_taus, A], taus [T, B, n_taus]).

        ``carry0``: warm-start carry (stored behavior-time snapshot at the
        window start, pfrl/agents/dqn.py:533-543); zeros when absent.
        """
        xs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), obs_seq)
        T = jax.tree.leaves(xs)[0].shape[0]
        tau_rngs = jax.random.split(jax.random.fold_in(rng, 1), T)
        if carry0 is None:
            carry0 = self.initial_carry(B)

        p = cast_floating(params, self.compute_dtype)

        def body(carry, inp):
            x, tau_rng = inp
            taus = jax.random.uniform(tau_rng, (B, n_taus))
            av, carry = self.model.apply(
                p,
                cast_floating(self.phi(x), self.compute_dtype),
                taus,
                carry,
                rngs={"noise": rng},
            )
            if self.compute_dtype is not None:
                av = cast_to_float32(av)
                carry = cast_to_float32(carry)
            return carry, (av.quantiles, taus)

        _, (quantiles, taus) = jax.lax.scan(body, carry0, (xs, tau_rngs))
        return quantiles, taus

    def update_episodic(self, state: DQNState, rng, batch: EpisodeBatch):
        tr = batch.transitions
        B, T = batch.mask.shape

        init_c = batch.init_carry
        tgt_c = batch.next_init_carry

        def loss_fn(params):
            rng_on, rng_tgt = jax.random.split(rng)
            quant, taus = self._unroll_quantiles(
                params, rng_on, tr.obs, B, self.N, init_c
            )  # [T,B,N,A], [T,B,N]
            tgt_quant, _ = self._unroll_quantiles(
                state.target_params, rng_tgt, tr.next_obs, B, self.N_prime, tgt_c
            )  # [T,B,N',A]

            action = jnp.swapaxes(tr.action, 0, 1).astype(jnp.int32)  # [T,B]
            y = jnp.take_along_axis(
                quant, action[:, :, None, None], axis=3
            )[..., 0]  # [T,B,N]
            # Greedy wrt the target net's mean quantiles (IQN default).
            greedy = jnp.argmax(jnp.mean(tgt_quant, axis=2), axis=-1)  # [T,B]
            next_q = jnp.take_along_axis(
                tgt_quant, greedy[:, :, None, None], axis=3
            )[..., 0]  # [T,B,N']

            r = jnp.swapaxes(tr.reward, 0, 1)
            term = jnp.swapaxes(tr.terminated, 0, 1).astype(jnp.float32)
            target = (
                r[..., None] + self.gamma * (1.0 - term[..., None]) * next_q
            )
            el = eltwise_huber_quantile_loss(
                y.reshape(T * B, self.N),
                jax.lax.stop_gradient(target.reshape(T * B, self.N_prime)),
                taus.reshape(T * B, self.N),
            )  # [T*B, N, N']
            per = jnp.sum(jnp.mean(el, axis=2), axis=1).reshape(T, B)
            m = jnp.swapaxes(batch.mask, 0, 1)
            if self.batch_accumulator == "mean":
                loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
            else:
                loss = jnp.sum(per * m) / B
            # Per-window masked mean quantile loss: the prioritized
            # episodic buffer's priority feedback signal.
            win_err = jnp.sum(per * m, axis=0) / jnp.maximum(
                jnp.sum(m, axis=0), 1.0
            )
            return loss, (
                jnp.mean(jnp.mean(quant, axis=2) * m[..., None]),
                win_err,
            )

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
