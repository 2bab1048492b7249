"""PPO — clipped-surrogate policy optimization.

Reference parity: pfrl/agents/ppo.py:260-817. The reference collects
python transition dicts per env, computes GAE per-episode in Python
(ppo.py:36-53), then runs epochs of minibatch SGD. Here:

- rollouts are time-major device arrays ``[T, B, ...]`` filled in place
  (shell) or produced by a scan (runner);
- GAE is one backward ``lax.scan`` over the whole [T, B] block
  (pfrl_tpu/ops/returns.py) — episode boundaries handled by flags, no
  per-episode Python;
- the epochs x minibatch loop is inside ONE jitted update: static loop
  bounds, ``jax.random.permutation`` shuffling, advantage standardization
  over the full dataset (ppo.py:476-495), clipped value loss (ppo.py:
  634-671) and explained variance (ppo.py:181-193) included.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from pfrl_tpu.agent import AttributeSavingMixin, BatchAgent
from pfrl_tpu.ops.returns import gae_advantages
from pfrl_tpu.utils.precision import apply_cast
from pfrl_tpu.utils.stats import RunningStats


def _identity(x):
    return x


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    n_updates: jax.Array


@struct.dataclass
class Rollout:
    """Time-major on-policy rollout ``[T, B, ...]``.

    ``carry``/``next_value`` are populated only on the recurrent path
    (:class:`pfrl_tpu.agents.recurrent_ppo.RecurrentPPOCore`): the policy
    carry as it was *before* acting at each step, and V(s_{t+1}) evaluated
    with the post-step carry on the pre-reset next observation.
    """

    obs: Any
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    terminated: jax.Array
    done: jax.Array
    next_obs: Any
    carry: Any = ()
    next_value: Any = None


class PPOCore:
    def __init__(
        self,
        model,                        # module: obs -> (Distribution, value[B,1] or [B])
        optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        lambd: float = 0.95,
        clip_eps: float = 0.2,
        clip_eps_vf: Optional[float] = None,
        entropy_coef: float = 0.01,
        value_func_coef: float = 1.0,
        epochs: int = 8,
        minibatch_size: int = 64,
        standardize_advantages: bool = True,
        max_grad_norm: Optional[float] = None,
        phi: Callable = _identity,
        compute_dtype: Optional[Any] = None,
    ):
        self.model = model
        self.optimizer = (
            optax.chain(optax.clip_by_global_norm(max_grad_norm), optimizer)
            if max_grad_norm is not None
            else optimizer
        )
        self.gamma = gamma
        self.lambd = lambd
        self.clip_eps = clip_eps
        self.clip_eps_vf = clip_eps_vf
        self.entropy_coef = entropy_coef
        self.value_func_coef = value_func_coef
        self.epochs = epochs
        self.minibatch_size = minibatch_size
        self.standardize_advantages = standardize_advantages
        self.phi = phi
        # Mixed precision (TPU-native; see utils/precision.py): bf16
        # shared-net forward+backward over fp32 masters. The distribution
        # params and value come back fp32, so log-prob ratios, GAE, and
        # the clipped losses are full precision.
        self.compute_dtype = compute_dtype

    # ----------------------------------------------------------------- setup
    def init(self, rng: jax.Array, example_obs, example_action=None) -> PPOState:
        del example_action
        params = self.model.init(rng, self.phi(example_obs))
        return PPOState(
            params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- act
    def forward(self, params, obs):
        dist, value = apply_cast(
            self.model, params, self.compute_dtype, self.phi(obs)
        )
        value = value[..., 0] if value.ndim > 1 else value
        return dist, value

    def select_action(self, state, rng, obs, t, training: bool):
        dist, _ = self.forward(state.params, obs)
        if training:
            return dist.sample(rng)
        return dist.mode()

    def act_with_aux(self, state, rng, obs, training: bool = True):
        dist, value = self.forward(state.params, obs)
        action = dist.sample(rng) if training else dist.mode()
        return action, {"log_prob": dist.log_prob(action), "value": value}

    # ---------------------------------------------------------------- update
    def _dataset_from_rollout(self, params, rollout: Rollout):
        T, B = rollout.reward.shape
        flat_next = jax.tree.map(
            lambda x: x.reshape((T * B,) + x.shape[2:]), rollout.next_obs
        )
        _, next_values = self.forward(params, flat_next)
        next_values = next_values.reshape(T, B)
        advs, v_targets = gae_advantages(
            rollout.reward,
            rollout.value,
            next_values,
            rollout.terminated,
            rollout.done,
            self.gamma,
            self.lambd,
        )

        def flat(x):
            return x.reshape((T * B,) + x.shape[2:])

        return (
            jax.tree.map(flat, rollout.obs),
            flat(rollout.action),
            flat(rollout.log_prob),
            flat(rollout.value),
            flat(advs),
            flat(v_targets),
        )

    def _minibatch_loss(self, params, obs, action, old_lp, old_v, adv, v_target):
        dist, value = self.forward(params, obs)
        log_prob = dist.log_prob(action)
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
        entropy = jnp.mean(dist.entropy())
        loss = (
            policy_loss
            + self.value_func_coef * value_loss
            - self.entropy_coef * entropy
        )
        return loss, (policy_loss, value_loss, entropy)

    def update(self, state: PPOState, rng: jax.Array, rollout: Rollout):
        obs, action, old_lp, old_v, adv, v_target = self._dataset_from_rollout(
            state.params, rollout
        )
        n = adv.shape[0]
        if self.standardize_advantages:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        n_mb = max(1, n // self.minibatch_size)
        mb = self.minibatch_size if n >= self.minibatch_size else n

        def epoch_body(carry, rng_e):
            params, opt_state = carry
            perm = jax.random.permutation(rng_e, n)

            def mb_body(carry, idx):
                params, opt_state = carry
                take = lambda x: jax.tree.map(lambda l: l[idx], x)
                (loss, aux), grads = jax.value_and_grad(
                    self._minibatch_loss, has_aux=True
                )(
                    params,
                    take(obs),
                    action[idx],
                    old_lp[idx],
                    old_v[idx],
                    adv[idx],
                    v_target[idx],
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

        # Explained variance over the dataset (ppo.py:181-193).
        var_y = jnp.var(v_target)
        explained_var = 1.0 - jnp.var(v_target - old_v) / (var_y + 1e-8)

        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            n_updates=state.n_updates + self.epochs * n_mb,
        )
        aux = {
            "loss": loss,
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy,
            "explained_variance": explained_var,
            "errors": jnp.zeros((1,)),  # protocol filler (no PER on-policy)
        }
        return new_state, aux


class OnPolicyShellAgent(AttributeSavingMixin, BatchAgent):
    """Host shell shared by PPO/A2C/TRPO: fills a device rollout block,
    updates when full (the reference's update_interval semantics,
    ppo.py:756-807)."""

    saved_attributes = ("train_state",)

    def __init__(self, core, update_interval: int = 2048, seed: int = 0):
        self.core = core
        self.update_interval = update_interval
        self.rng = jax.random.PRNGKey(seed)
        self.t = 0
        self.train_state = None
        self._rollout = None       # dict of device arrays [T, B, ...]
        self._ptr = 0
        self._T = None
        self._last_obs = None
        self._last_action = None
        self._last_aux = None
        self._jit_act = None
        self._jit_update = None
        self._jit_store = None
        self._loss_stats = RunningStats(100)
        self._value_stats = RunningStats(1000)
        self._entropy_stats = RunningStats(1000)

    def _next_rng(self):
        self.rng, out = jax.random.split(self.rng)
        return out

    # ------------------------------------------------------------------- act
    def batch_act(self, batch_obs):
        batch_obs = np.asarray(batch_obs)
        if self.train_state is None:
            self.train_state = self.core.init(
                self._next_rng(), jnp.asarray(batch_obs)
            )
            self._restore_pending()
            self._jit_act = jax.jit(
                self.core.act_with_aux, static_argnames=("training",)
            )
        action, aux = self._jit_act(
            self.train_state, self._next_rng(), jnp.asarray(batch_obs), self.training
        )
        if self.training:
            self._last_obs = batch_obs
            self._last_action = np.asarray(action)
            self._last_aux = aux
            self._value_stats.append(float(jnp.mean(aux["value"])))
        return np.asarray(action)

    # --------------------------------------------------------------- observe
    def _ensure_rollout(self, b):
        if self._rollout is not None:
            return
        assert self.update_interval % b == 0, (
            f"update_interval {self.update_interval} must divide by num_envs {b}"
        )
        self._T = self.update_interval // b
        T = self._T

        def alloc(x):
            x = jnp.asarray(x)
            return jnp.zeros((T,) + x.shape, x.dtype)

        self._rollout = Rollout(
            obs=jax.tree.map(alloc, jnp.asarray(self._last_obs)),
            action=alloc(self._last_action),
            log_prob=alloc(self._last_aux["log_prob"]),
            value=alloc(self._last_aux["value"]),
            reward=alloc(jnp.zeros((b,), jnp.float32)),
            terminated=alloc(jnp.zeros((b,), bool)),
            done=alloc(jnp.zeros((b,), bool)),
            next_obs=jax.tree.map(alloc, jnp.asarray(self._last_obs)),
        )

        def store(rollout, ptr, obs, action, lp, value, reward, term, done, next_obs):
            return Rollout(
                obs=jax.tree.map(lambda s, x: s.at[ptr].set(x), rollout.obs, obs),
                action=rollout.action.at[ptr].set(action),
                log_prob=rollout.log_prob.at[ptr].set(lp),
                value=rollout.value.at[ptr].set(value),
                reward=rollout.reward.at[ptr].set(reward),
                terminated=rollout.terminated.at[ptr].set(term),
                done=rollout.done.at[ptr].set(done),
                next_obs=jax.tree.map(
                    lambda s, x: s.at[ptr].set(x), rollout.next_obs, next_obs
                ),
            )

        self._jit_store = jax.jit(store)
        self._jit_update = jax.jit(self.core.update)

    def batch_observe(self, batch_obs, batch_reward, batch_done, batch_reset):
        if not self.training:
            return
        batch_obs = np.asarray(batch_obs)
        b = batch_obs.shape[0]
        self._ensure_rollout(b)
        done = np.asarray(batch_done, dtype=bool)
        reset = np.asarray(batch_reset, dtype=bool)
        self._rollout = self._jit_store(
            self._rollout,
            jnp.asarray(self._ptr, jnp.int32),
            jnp.asarray(self._last_obs),
            jnp.asarray(self._last_action),
            self._last_aux["log_prob"],
            self._last_aux["value"],
            jnp.asarray(batch_reward, jnp.float32),
            jnp.asarray(done),
            jnp.asarray(done | reset),
            jnp.asarray(batch_obs),
        )
        self._ptr += 1
        self.t += b
        if self._ptr == self._T:
            self.train_state, aux = self._jit_update(
                self.train_state, self._next_rng(), self._rollout
            )
            self._ptr = 0
            self._loss_stats.append(float(aux["loss"]))
            if "entropy" in aux:
                self._entropy_stats.append(float(aux["entropy"]))

    def get_statistics(self):
        return [
            ("average_value", self._value_stats.mean()),
            ("average_entropy", self._entropy_stats.mean()),
            ("average_loss", self._loss_stats.mean()),
            (
                "n_updates",
                int(self.train_state.n_updates) if self.train_state is not None else 0,
            ),
        ]


class PPO(OnPolicyShellAgent):
    """pfrl-protocol PPO (ppo.py:260-817)."""

    def __init__(
        self,
        model,
        optimizer,
        *,
        gpu=None,
        gamma: float = 0.99,
        lambd: float = 0.95,
        phi=_identity,
        value_func_coef: float = 1.0,
        entropy_coef: float = 0.01,
        update_interval: int = 2048,
        minibatch_size: int = 64,
        epochs: int = 10,
        clip_eps: float = 0.2,
        clip_eps_vf=None,
        standardize_advantages: bool = True,
        max_grad_norm=None,
        compute_dtype=None,
        seed: int = 0,
    ):
        del gpu
        core = PPOCore(
            model=model,
            optimizer=optimizer,
            gamma=gamma,
            lambd=lambd,
            clip_eps=clip_eps,
            clip_eps_vf=clip_eps_vf,
            entropy_coef=entropy_coef,
            value_func_coef=value_func_coef,
            epochs=epochs,
            minibatch_size=minibatch_size,
            standardize_advantages=standardize_advantages,
            max_grad_norm=max_grad_norm,
            phi=phi,
            compute_dtype=compute_dtype,
        )
        super().__init__(core, update_interval=update_interval, seed=seed)
