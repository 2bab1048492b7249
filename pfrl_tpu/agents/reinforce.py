"""REINFORCE — episodic Monte-Carlo policy gradient.

Reference parity: pfrl/agents/reinforce.py:14-219 (per-episode returns,
``batchsize`` episodes per update, optional reward standardization /
average-return baseline). Episodes are padded to ``max_episode_len`` and
masked — the static-shape replacement for the reference's per-episode
Python loss accumulation.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from pfrl_tpu.agent import AttributeSavingMixin, BatchAgent
from pfrl_tpu.utils.precision import apply_cast
from pfrl_tpu.utils.stats import RunningStats


def _identity(x):
    return x


@struct.dataclass
class ReinforceState:
    params: jax.Array
    opt_state: jax.Array
    n_updates: jax.Array


class ReinforceCore:
    def __init__(
        self,
        model,                       # obs -> Distribution
        optimizer: optax.GradientTransformation,
        gamma: float = 0.99,
        beta: float = 0.0,           # entropy bonus
        baseline: bool = False,      # subtract mean return (per update)
        phi: Callable = _identity,
        compute_dtype: Optional[Any] = None,
    ):
        self.model = model
        self.optimizer = optimizer
        self.gamma = gamma
        self.beta = beta
        self.baseline = baseline
        self.phi = phi
        # bf16 policy forward/backward over fp32 masters; returns-to-go,
        # log-probs, and the PG loss stay fp32 (utils/precision.py).
        self.compute_dtype = compute_dtype

    def init(self, rng, example_obs, example_action=None) -> ReinforceState:
        del example_action
        params = self.model.init(rng, self.phi(example_obs))
        return ReinforceState(
            params=params,
            opt_state=self.optimizer.init(params),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def select_action(self, state, rng, obs, t, training: bool):
        dist = apply_cast(
            self.model, state.params, self.compute_dtype, self.phi(obs)
        )
        return dist.sample(rng) if training else dist.mode()

    def update(self, state: ReinforceState, rng, obs, actions, rewards, mask):
        """obs/actions/rewards/mask: ``[E, L, ...]`` padded episodes."""
        E, L = rewards.shape

        # Per-step discounted returns-to-go within each episode.
        def body(carry, inp):
            r, m = inp
            g = r + self.gamma * carry * m
            return g, g

        _, returns = jax.lax.scan(
            body,
            jnp.zeros((E,), jnp.float32),
            (rewards.T, mask.T.astype(jnp.float32)),
            reverse=True,
        )
        returns = returns.T  # [E, L]
        if self.baseline:
            total = jnp.sum(mask)
            mean_g = jnp.sum(returns * mask) / jnp.maximum(total, 1.0)
            returns = returns - mean_g

        def loss_fn(params):
            flat_obs = jax.tree.map(
                lambda x: x.reshape((E * L,) + x.shape[2:]), obs
            )
            dist = apply_cast(
                self.model, params, self.compute_dtype, self.phi(flat_obs)
            )
            lp = dist.log_prob(actions.reshape((E * L,) + actions.shape[2:]))
            m = mask.reshape(E * L)
            pg = -jnp.sum(lp * jax.lax.stop_gradient(returns.reshape(E * L)) * m)
            ent = jnp.sum(dist.entropy() * m)
            # Reference normalizes by number of episodes (reinforce.py:176).
            return (pg - self.beta * ent) / E

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        return (
            ReinforceState(
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state,
                n_updates=state.n_updates + 1,
            ),
            {"loss": loss},
        )


class REINFORCE(AttributeSavingMixin, BatchAgent):
    """pfrl-protocol REINFORCE (reinforce.py:14-219)."""

    saved_attributes = ("train_state",)

    def __init__(
        self,
        model,
        optimizer,
        *,
        gpu=None,
        gamma: float = 0.99,
        beta: float = 0.0,
        phi=_identity,
        batchsize: int = 10,
        max_episode_len: int = 1000,
        backward_separately: bool = False,
        average_entropy_decay=0.999,
        baseline: bool = False,
        compute_dtype=None,
        seed: int = 0,
    ):
        del gpu, backward_separately, average_entropy_decay
        self.core = ReinforceCore(
            model, optimizer, gamma=gamma, beta=beta, baseline=baseline,
            phi=phi, compute_dtype=compute_dtype,
        )
        self.batchsize = batchsize
        self.max_episode_len = max_episode_len
        self.rng = jax.random.PRNGKey(seed)
        self.t = 0
        self.train_state = None
        # Host-side episode staging (ragged); collated+padded per update.
        self._current = None  # per-lane lists of (obs, action, reward)
        self._episodes = []
        self._jit_act = None
        self._jit_update = None
        self._loss_stats = RunningStats(100)

    def _next_rng(self):
        self.rng, out = jax.random.split(self.rng)
        return out

    def batch_act(self, batch_obs):
        batch_obs = np.asarray(batch_obs)
        if self.train_state is None:
            self.train_state = self.core.init(self._next_rng(), jnp.asarray(batch_obs))
            self._restore_pending()
            self._jit_act = jax.jit(
                self.core.select_action, static_argnames=("training",)
            )
            self._jit_update = jax.jit(self.core.update)
        actions = self._jit_act(
            self.train_state,
            self._next_rng(),
            jnp.asarray(batch_obs),
            jnp.asarray(self.t, jnp.int32),
            self.training,
        )
        if self.training:
            self._last_obs = batch_obs
            self._last_action = np.asarray(actions)
        return np.asarray(actions)

    def batch_observe(self, batch_obs, batch_reward, batch_done, batch_reset):
        if not self.training:
            return
        b = len(batch_reward)
        if self._current is None:
            self._current = [[] for _ in range(b)]
        for i in range(b):
            self._current[i].append(
                (self._last_obs[i], self._last_action[i], float(batch_reward[i]))
            )
            if batch_done[i] or batch_reset[i]:
                if self._current[i]:
                    self._episodes.append(self._current[i])
                self._current[i] = []
        self.t += b
        while len(self._episodes) >= self.batchsize:
            self._update_batch(self._episodes[: self.batchsize])
            self._episodes = self._episodes[self.batchsize :]

    def _update_batch(self, episodes):
        E = len(episodes)
        L = self.max_episode_len
        obs_shape = episodes[0][0][0].shape
        a0 = np.asarray(episodes[0][0][1])
        obs = np.zeros((E, L) + obs_shape, np.float32)
        actions = np.zeros((E, L) + a0.shape, a0.dtype)
        rewards = np.zeros((E, L), np.float32)
        mask = np.zeros((E, L), np.float32)
        for e, ep in enumerate(episodes):
            for t, (o, a, r) in enumerate(ep[:L]):
                obs[e, t] = o
                actions[e, t] = a
                rewards[e, t] = r
                mask[e, t] = 1.0
        self.train_state, aux = self._jit_update(
            self.train_state,
            self._next_rng(),
            jnp.asarray(obs),
            jnp.asarray(actions),
            jnp.asarray(rewards),
            jnp.asarray(mask),
        )
        self._loss_stats.append(float(aux["loss"]))

    def get_statistics(self):
        return [
            ("average_loss", self._loss_stats.mean()),
            (
                "n_updates",
                int(self.train_state.n_updates) if self.train_state is not None else 0,
            ),
        ]
