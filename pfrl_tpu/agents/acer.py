"""ACER — actor-critic with experience replay (discrete actions).

Reference parity: pfrl/agents/acer.py:251-830 — truncated importance
sampling with full bias correction (:30-115), Retrace-style Q_ret / Q_opc
recursion (:461-552), efficient-TRPO gradient projection against a Polyak
average model (:207-248, 396-402), episodic replay storing the behavior
distribution mu (:779-789).

TPU-native re-expression (SURVEY.md §2.6): the reference runs ACER as
asynchronous CPU workers; here it is a synchronous batched learner — padded
episodes sampled from the episodic device buffer (mu logits stored in
transition ``extras``), the Retrace recursion as one reverse ``lax.scan``
over [T, B], and the trust-region projection done in logit space via a
linearized surrogate (exactly the reference's compute_loss_with_kl_constraint
mechanism, acer.py:207-248, expressed with stop_gradients instead of a
custom autograd node). Fresh episodes have rho ~= 1, so replay-only updates
cover the reference's on-policy term in expectation.

Continuous-action ACER (SDN advantage sampling, acer.py:118-169) is not yet
implemented.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pfrl_tpu.replay.episodic import EpisodeBatch
from pfrl_tpu.utils.copy_param import soft_copy_param


def _identity(x):
    return x


@struct.dataclass
class ACERState:
    params: Any
    avg_params: Any       # Polyak average model for the trust region
    opt_state: Any
    n_updates: jax.Array


class ACERCore:
    """model: obs -> (Categorical pi, DiscreteActionValue q); V = E_pi[Q]."""

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        beta: float = 1e-2,                  # entropy bonus
        truncation_threshold: float = 10.0,  # c in the paper
        use_trust_region: bool = True,
        trust_region_delta: float = 0.1,
        trust_region_alpha: float = 0.99,    # avg-model Polyak rate
        use_Q_opc: bool = False,
        phi: Callable = _identity,
    ):
        self.model = model
        self.optimizer = optimizer
        self.gamma = gamma
        self.beta = beta
        self.c = truncation_threshold
        self.use_trust_region = use_trust_region
        self.delta = trust_region_delta
        self.alpha = trust_region_alpha
        self.use_Q_opc = use_Q_opc
        self.phi = phi

    # ----------------------------------------------------------------- setup
    def init(self, rng, example_obs, example_action=None) -> ACERState:
        del example_action
        params = self.model.init(rng, self.phi(example_obs))
        return ACERState(
            params=params,
            avg_params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def forward(self, params, obs):
        return self.model.apply(params, self.phi(obs))

    def select_action(self, state, rng, obs, t, training: bool):
        pi, _ = self.forward(state.params, obs)
        return pi.sample(rng) if training else pi.mode()

    def select_action_with_extras(self, state, rng, obs, t, training: bool):
        """Also emit the behavior distribution for replay (mu storage,
        acer.py:779-789)."""
        pi, _ = self.forward(state.params, obs)
        a = pi.sample(rng) if training else pi.mode()
        return a, {"mu_logits": pi.log_probs}

    # ---------------------------------------------------------------- update
    def update_episodic(self, state: ACERState, rng, batch: EpisodeBatch):
        tr = batch.transitions
        B, T = batch.mask.shape
        A = tr.extras["mu_logits"].shape[-1]
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # -> time-major [T, B, ...]

        obs_flat = jax.tree.map(
            lambda x: x.reshape((B * T,) + x.shape[2:]), tr.obs
        )
        next_obs_flat = jax.tree.map(
            lambda x: x.reshape((B * T,) + x.shape[2:]), tr.next_obs
        )

        def loss_fn(params):
            pi, av = self.forward(params, obs_flat)
            logits = pi.log_probs.reshape(B, T, A)       # normalized log-probs
            q = av.q_values.reshape(B, T, A)

            # Everything below is a pure function of (logits, q); compute the
            # loss through this function so the trust-region projection can
            # act in logit space.
            return self._loss_from_stats(
                state, params, logits, q, batch, next_obs_flat
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        avg_params = soft_copy_param(state.avg_params, params, 1.0 - self.alpha)
        new_state = ACERState(
            params=params,
            avg_params=avg_params,
            opt_state=opt_state,
            n_updates=state.n_updates + 1,
        )
        aux = dict(aux)
        aux["loss"] = loss
        aux["errors"] = jnp.zeros((1,))
        return new_state, aux

    # Alias so the non-episodic runner path errors loudly.
    update = None

    def _loss_from_stats(self, state, params, logits, q, batch, next_obs_flat):
        tr = batch.transitions
        B, T = batch.mask.shape
        A = logits.shape[-1]
        mask = batch.mask                             # [B, T]
        actions = tr.action.astype(jnp.int32)         # [B, T]
        mu_logits = tr.extras["mu_logits"]            # [B, T, A]

        probs = jnp.exp(logits)
        v = jnp.sum(probs * q, axis=-1)               # [B, T]
        q_a = jnp.take_along_axis(q, actions[..., None], axis=-1)[..., 0]
        logpi_a = jnp.take_along_axis(logits, actions[..., None], axis=-1)[..., 0]
        mu_a = jnp.take_along_axis(mu_logits, actions[..., None], axis=-1)[..., 0]
        rho_a = jnp.exp(jax.lax.stop_gradient(logpi_a) - mu_a)      # [B, T]
        rho_all = jnp.exp(jax.lax.stop_gradient(logits) - mu_logits)  # [B, T, A]

        # Bootstrap value at the tail of each (possibly truncated) episode.
        _, next_av = self.forward(
            jax.lax.stop_gradient(params), next_obs_flat
        )
        next_pi, _ = self.forward(jax.lax.stop_gradient(params), next_obs_flat)
        next_v = jnp.sum(
            jnp.exp(next_pi.log_probs) * next_av.q_values, axis=-1
        ).reshape(B, T)

        # ---------------- Retrace recursion (acer.py:461-552), reverse scan.
        lengths = batch.lengths                       # [B]
        term = tr.terminated.astype(jnp.float32)      # [B, T]
        r = tr.reward                                 # [B, T]
        c_ret = jnp.minimum(1.0, rho_a)
        v_sg = jax.lax.stop_gradient(v)
        q_a_sg = jax.lax.stop_gradient(q_a)

        def body(carry, inp):
            qret, qopc = carry
            r_t, term_t, nv_t, c_t, v_t, q_t, is_last = inp
            # At each row's last valid step, restart from the bootstrap.
            boot = (1.0 - term_t) * nv_t
            qret = jnp.where(is_last > 0, boot, qret)
            qopc = jnp.where(is_last > 0, boot, qopc)
            qret_t = r_t + self.gamma * qret
            qopc_t = r_t + self.gamma * qopc
            qret = c_t * (qret_t - q_t) + v_t
            qopc = qopc_t - q_t + v_t
            return (qret, qopc), (qret_t, qopc_t)

        t_idx = jnp.arange(T)[None, :]
        is_last = (t_idx == (lengths - 1)[:, None]).astype(jnp.float32)
        inputs = jax.tree.map(
            lambda x: jnp.swapaxes(x, 0, 1),
            (r, term, jax.lax.stop_gradient(next_v), c_ret, v_sg, q_a_sg, is_last),
        )
        (_, _), (qret_T, qopc_T) = jax.lax.scan(
            body,
            (jnp.zeros((B,)), jnp.zeros((B,))),
            inputs,
            reverse=True,
        )
        q_ret = jnp.swapaxes(qret_T, 0, 1)            # [B, T]
        q_opc = jnp.swapaxes(qopc_T, 0, 1)

        adv = (q_opc if self.use_Q_opc else q_ret) - v_sg

        # ---------------- policy gradient with bias correction (:30-115)
        trunc_rho = jnp.minimum(self.c, rho_a)
        g_loss = -trunc_rho * logpi_a * jax.lax.stop_gradient(adv)
        # Full correction over all actions.
        corr_w = jax.nn.relu(1.0 - self.c / jnp.maximum(rho_all, 1e-10)) * jnp.exp(
            jax.lax.stop_gradient(logits)
        )
        corr_adv = jax.lax.stop_gradient(q) - v_sg[..., None]
        g_loss = g_loss - jnp.sum(-corr_w * logits * corr_adv, axis=-1) * (-1.0)
        # (reference adds the correction term: g_loss += -(w * logits * adv).sum())

        # ---------------- trust region in logit space (:207-248)
        if self.use_trust_region:
            avg_pi, _ = self.forward(state.avg_params,
                jax.tree.map(lambda x: x.reshape((B * T,) + x.shape[2:]), tr.obs))
            avg_logits = jax.lax.stop_gradient(avg_pi.log_probs).reshape(B, T, A)

            def g_of_logits(lg):
                lp_a = jnp.take_along_axis(lg, actions[..., None], axis=-1)[..., 0]
                gl = -trunc_rho * lp_a * jax.lax.stop_gradient(adv)
                gl = gl + jnp.sum(corr_w * lg * corr_adv, axis=-1) * (-1.0)
                return jnp.sum(gl * mask)

            g = -jax.grad(g_of_logits)(jax.lax.stop_gradient(logits))
            # k = grad of KL(avg || pi) wrt logits = pi - avg_probs
            k = jnp.exp(jax.lax.stop_gradient(logits)) - jnp.exp(avg_logits)
            kg = jnp.sum(k * g, axis=-1)
            k2 = jnp.sum(k * k, axis=-1)
            factor = jax.nn.relu((kg - self.delta) / jnp.maximum(k2, 1e-10))
            g_adj = g - factor[..., None] * k
            # Linearized surrogate: gradient wrt logits equals -g_adj.
            pi_loss_tr = -jnp.sum(logits * jax.lax.stop_gradient(g_adj), axis=-1)
            pi_loss = pi_loss_tr
            kl_mean = jnp.sum(
                jnp.sum(jnp.exp(avg_logits) * (avg_logits - logits), axis=-1) * mask
            ) / jnp.maximum(jnp.sum(mask), 1.0)
        else:
            pi_loss = g_loss
            kl_mean = jnp.zeros(())

        entropy = -jnp.sum(probs * logits, axis=-1)
        pi_loss = pi_loss - self.beta * entropy

        q_loss = 0.5 * (jax.lax.stop_gradient(q_ret) - q_a) ** 2

        denom = jnp.maximum(jnp.sum(mask), 1.0)
        total = jnp.sum((pi_loss + q_loss) * mask) / denom
        aux = {
            "pi_loss": jnp.sum(pi_loss * mask) / denom,
            "q_loss": jnp.sum(q_loss * mask) / denom,
            "kl": kl_mean,
            "entropy": jnp.sum(entropy * mask) / denom,
        }
        return total, aux
