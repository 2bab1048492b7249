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

Continuous-action ACER (:class:`ACERContinuousCore`) implements the SDN
(stochastic dueling network) head — Q(s,a) = V(s) + A(s,a) - mean_i A(s,a_i)
with a_i ~ pi (acer.py:138-169) — the sampled bias-correction term
(acer.py:48-68), the per-dimension Retrace coefficient c = min(1, rho^(1/d))
and the extra V-function loss (acer.py:520-552), and the trust region acting
on the Gaussian's (mean, std) statistics (acer.py:207-248).
"""

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from pfrl_tpu.distributions.normal import Normal
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
        compute_dtype=None,
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
        # bf16 network compute over fp32 masters (utils/precision.py); the
        # Retrace recursion, trust-region KL, and optimizer stay fp32.
        self.compute_dtype = compute_dtype

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
        from pfrl_tpu.utils.precision import apply_cast

        return apply_cast(
            self.model, params, self.compute_dtype, self.phi(obs)
        )

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


# ============================================================== continuous
class ACERSDNModel(nn.Module):
    """Stochastic-dueling ACER head (reference ACERContinuousActionHead,
    acer.py:138-169): separate pi / V / advantage modules, with
    ``Q(s, a) = V(s) + A(s, a) - (1/n) sum_i A(s, a_i), a_i ~ pi``.

    ``pi`` maps obs to a :class:`Normal`; ``vf`` maps obs to ``[B, 1]``;
    ``adv`` maps (obs, action) to ``[B, 1]`` (an FCSAQFunction works).
    """

    pi: nn.Module
    vf: nn.Module
    adv: nn.Module

    def __call__(self, x, a):
        """Init path: touch every submodule."""
        dist = self.pi(x)
        v = self.vf(x)
        q = self.adv(x, a)
        return dist, v, q

    def pi_v(self, x):
        v = self.vf(x)
        return self.pi(x), (v[..., 0] if v.ndim > 1 else v)

    def advantage(self, x, a):
        q = self.adv(x, a)
        return q[..., 0] if q.ndim > 1 else q


@struct.dataclass
class ACERContinuousState:
    params: Any
    avg_params: Any
    opt_state: Any
    n_updates: jax.Array


class ACERContinuousCore:
    """Continuous-action ACER over an :class:`ACERSDNModel`.

    Same batched-episodic re-expression as :class:`ACERCore` (padded
    [B, T] episodes, Retrace as one reverse scan), with the reference's
    continuous-action specifics: density-ratio importance weights from the
    stored behavior Gaussian, sampled bias correction, per-dimension
    Retrace truncation, SDN Q evaluation, the additional V loss, and a
    trust region on the Gaussian (mean, std) stats.
    """

    def __init__(
        self,
        model: ACERSDNModel,
        optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        beta: float = 1e-2,
        truncation_threshold: float = 5.0,
        n_sdn_samples: int = 5,
        use_trust_region: bool = True,
        trust_region_delta: float = 0.1,
        trust_region_alpha: float = 0.99,
        use_Q_opc: bool = True,
        phi: Callable = _identity,
        compute_dtype=None,
    ):
        # use_Q_opc defaults True for continuous actions, as recommended by
        # the paper and the reference's docstring (acer.py:321-325).
        self.model = model
        self.optimizer = optimizer
        self.gamma = gamma
        self.beta = beta
        self.c = truncation_threshold
        self.n_sdn = n_sdn_samples
        self.use_trust_region = use_trust_region
        self.delta = trust_region_delta
        self.alpha = trust_region_alpha
        self.use_Q_opc = use_Q_opc
        self.phi = phi
        self.compute_dtype = compute_dtype

    # ----------------------------------------------------------------- setup
    def init(self, rng, example_obs, example_action) -> ACERContinuousState:
        params = self.model.init(
            rng, self.phi(example_obs), example_action
        )
        return ACERContinuousState(
            params=params,
            avg_params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def _pi_v(self, params, obs):
        from pfrl_tpu.utils.precision import apply_cast

        return apply_cast(
            self.model, params, self.compute_dtype, self.phi(obs),
            method=ACERSDNModel.pi_v,
        )

    def _adv(self, params, obs, a):
        from pfrl_tpu.utils.precision import apply_cast

        return apply_cast(
            self.model, params, self.compute_dtype, self.phi(obs), a,
            method=ACERSDNModel.advantage,
        )

    def select_action(self, state, rng, obs, t, training: bool):
        pi, _ = self._pi_v(state.params, obs)
        return pi.sample(rng) if training else pi.mode()

    def select_action_with_extras(self, state, rng, obs, t, training: bool):
        """Store the behavior Gaussian's stats for replay (the continuous
        analog of mu-logit storage, acer.py:779-789)."""
        pi, _ = self._pi_v(state.params, obs)
        a = pi.sample(rng) if training else pi.mode()
        return a, {"mu_mean": pi.loc, "mu_std": pi.scale}

    # ---------------------------------------------------------------- update
    def update_episodic(self, state: ACERContinuousState, rng, batch: EpisodeBatch):
        tr = batch.transitions
        B, T = batch.mask.shape

        flat = lambda x: x.reshape((B * T,) + x.shape[2:])
        obs_flat = jax.tree.map(flat, tr.obs)
        next_obs_flat = jax.tree.map(flat, tr.next_obs)

        def loss_fn(params):
            pi, v = self._pi_v(params, obs_flat)
            d = pi.loc.shape[-1]
            mean = pi.loc.reshape(B, T, d)
            std = pi.scale.reshape(B, T, d)
            return self._loss_from_stats(
                state, params, mean, std, v.reshape(B, T), batch,
                obs_flat, next_obs_flat, rng,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        avg_params = soft_copy_param(state.avg_params, params, 1.0 - self.alpha)
        new_state = ACERContinuousState(
            params=params,
            avg_params=avg_params,
            opt_state=opt_state,
            n_updates=state.n_updates + 1,
        )
        aux = dict(aux)
        aux["loss"] = loss
        aux["errors"] = jnp.zeros((1,))
        return new_state, aux

    update = None  # episodic only, like the discrete core

    def _loss_from_stats(
        self, state, params, mean, std, v, batch, obs_flat, next_obs_flat, rng
    ):
        tr = batch.transitions
        B, T = batch.mask.shape
        d = mean.shape[-1]
        mask = batch.mask
        sg = jax.lax.stop_gradient
        a = tr.action.reshape(B, T, d)
        a_flat = a.reshape(B * T, d)

        pi = Normal(loc=mean, scale=std)              # [B, T] event [d]
        # Padded steps carry zero-filled extras; a zero scale would produce
        # NaN log-probs that poison the whole loss even through the mask
        # (NaN * 0 == NaN), so patch padding to a standard normal.
        pad = (mask == 0)[..., None]
        mu = Normal(
            loc=jnp.where(pad, 0.0, tr.extras["mu_mean"]),
            scale=jnp.where(pad, 1.0, tr.extras["mu_std"]),
        )
        logpi_a = pi.log_prob(a)                      # [B, T]
        rho = jnp.exp(sg(logpi_a) - mu.log_prob(a))   # density ratio

        # ---- SDN Q evaluation (acer.py:155-168): sampled-advantage mean.
        rng_sdn, rng_corr = jax.random.split(rng)
        pi_sg = Normal(loc=sg(mean), scale=sg(std))

        def adv_of(actions_btd):
            return self._adv(
                params, obs_flat, actions_btd.reshape(B * T, d)
            ).reshape(B, T)

        # n independent samples: vmap over per-sample rngs.
        rngs = jax.random.split(rng_sdn, self.n_sdn)
        samples = jax.vmap(lambda k: pi_sg.sample(k))(rngs)   # [n, B, T, d]
        exp_adv = jnp.mean(jax.vmap(adv_of)(samples), axis=0)  # [B, T]
        q_a = v + adv_of(a) - exp_adv                 # [B, T], grads via v+adv

        # ---- bootstrap V at episode tails.
        _, next_v = self._pi_v(sg(params), next_obs_flat)
        next_v = sg(next_v).reshape(B, T)

        # ---- Retrace (acer.py:520-552): c = min(1, rho^(1/d)).
        lengths = batch.lengths
        term = tr.terminated.astype(jnp.float32)
        r = tr.reward
        c_ret = jnp.minimum(1.0, rho ** (1.0 / d))
        v_sg = sg(v)
        q_a_sg = sg(q_a)

        def body(carry, inp):
            qret, qopc = carry
            r_t, term_t, nv_t, c_t, v_t, q_t, is_last = inp
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
            (r, term, next_v, c_ret, v_sg, q_a_sg, is_last),
        )
        (_, _), (qret_T, qopc_T) = jax.lax.scan(
            body, (jnp.zeros((B,)), jnp.zeros((B,))), inputs, reverse=True
        )
        q_ret = jnp.swapaxes(qret_T, 0, 1)
        q_opc = jnp.swapaxes(qopc_T, 0, 1)
        adv_ret = (q_opc if self.use_Q_opc else q_ret) - v_sg

        # ---- sampled bias correction setup (acer.py:48-68): one action
        # drawn from the current policy, weighted by how far rho' exceeds c.
        a_corr = pi_sg.sample(rng_corr)               # [B, T, d]
        corr_q = v_sg + sg(adv_of(a_corr)) - sg(exp_adv)
        corr_adv = corr_q - v_sg                      # [B, T]

        def pi_loss_of(mean_, std_):
            p = Normal(loc=mean_, scale=std_)
            lp_a = p.log_prob(a)
            term1 = -jnp.minimum(self.c, rho) * lp_a * sg(adv_ret)
            lp_corr = p.log_prob(a_corr)
            rho_corr = jnp.exp(sg(lp_corr) - mu.log_prob(a_corr))
            w = jax.nn.relu(1.0 - self.c / jnp.maximum(rho_corr, 1e-10))
            term2 = -w * lp_corr * corr_adv
            return term1 + term2

        if self.use_trust_region:
            avg_pi, _ = self._pi_v(state.avg_params, obs_flat)
            avg = Normal(
                loc=sg(avg_pi.loc).reshape(B, T, d),
                scale=sg(avg_pi.scale).reshape(B, T, d),
            )

            def summed_loss(stats):
                return jnp.sum(pi_loss_of(*stats) * mask)

            g = jax.tree.map(
                lambda x: -x, jax.grad(summed_loss)((sg(mean), sg(std)))
            )

            def kl_of(stats):
                p = Normal(loc=stats[0], scale=stats[1])
                return jnp.sum(avg.kl(p) * mask)

            k = jax.grad(kl_of)((sg(mean), sg(std)))
            kg = sum(jnp.sum(ki * gi, axis=-1) for ki, gi in zip(k, g))
            k2 = sum(jnp.sum(ki * ki, axis=-1) for ki in k)
            factor = jax.nn.relu((kg - self.delta) / jnp.maximum(k2, 1e-10))
            g_adj = [gi - factor[..., None] * ki for gi, ki in zip(g, k)]
            pi_loss = -(
                jnp.sum(mean * sg(g_adj[0]), axis=-1)
                + jnp.sum(std * sg(g_adj[1]), axis=-1)
            )
            kl_mean = jnp.sum(avg.kl(Normal(loc=sg(mean), scale=sg(std))) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
        else:
            pi_loss = pi_loss_of(mean, std)
            kl_mean = jnp.zeros(())

        entropy = Normal(loc=mean, scale=std).entropy()
        pi_loss = pi_loss - self.beta * entropy

        # ---- value losses (acer.py:515-525): Q toward Q_ret, plus the
        # continuous-only V loss toward min(1, rho)*(Q_ret - Q) + V.
        q_loss = 0.5 * (sg(q_ret) - q_a) ** 2
        v_target = jnp.minimum(1.0, rho) * (sg(q_ret) - q_a_sg) + v_sg
        q_loss = q_loss + 0.5 * (sg(v_target) - v) ** 2

        denom = jnp.maximum(jnp.sum(mask), 1.0)
        total = jnp.sum((pi_loss + q_loss) * mask) / denom
        aux = {
            "pi_loss": jnp.sum(pi_loss * mask) / denom,
            "q_loss": jnp.sum(q_loss * mask) / denom,
            "kl": kl_mean,
            "entropy": jnp.sum(entropy * mask) / denom,
        }
        return total, aux
