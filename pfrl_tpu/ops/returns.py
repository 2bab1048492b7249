"""Return / advantage computation as scans.

Reference parity: GAE per-episode Python loop (pfrl/agents/ppo.py:36-53),
n-step reward folding in batch_experiences (pfrl/replay_buffer.py:183-206),
A2C's return recursion (pfrl/agents/a2c.py:150-167). All are backward
``lax.scan``s over time-major arrays — one XLA loop, no per-episode Python.

Conventions: arrays are time-major ``[T, B]`` (or ``[T]``); ``terminated``
cuts bootstrapping; episode boundaries inside a batch are handled by the
flags, so one scan covers many concatenated episodes.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def discounted_returns(
    rewards: jax.Array,
    terminated: jax.Array,
    bootstrap: jax.Array,
    gamma: float,
    done: jax.Array = None,
) -> jax.Array:
    """Monte-Carlo / n-step returns ``G_t = r_t + gamma * G_{t+1}``.

    ``terminated`` zeroes the bootstrap (true episode end); ``done``
    (terminated | truncated) restarts the recursion at ``bootstrap`` values
    when provided — pass per-step bootstrap values [T, B] in that case via
    broadcasting against ``bootstrap``.
    """
    if done is None:
        done = terminated

    def body(carry, inp):
        r, term, dn, boot = inp
        nxt = jnp.where(dn, boot, carry)
        g = r + gamma * jnp.where(term, 0.0, nxt)
        return g, g

    boots = jnp.broadcast_to(bootstrap, rewards.shape)
    _, gs = jax.lax.scan(
        body,
        boots[-1],
        (rewards, terminated, done, boots),
        reverse=True,
    )
    return gs


def gae_advantages(
    rewards: jax.Array,
    values: jax.Array,
    next_values: jax.Array,
    terminated: jax.Array,
    done: jax.Array,
    gamma: float,
    lambd: float,
) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation (ppo.py:36-53), batched over envs.

    Args are ``[T, B]``. ``next_values`` are V(s_{t+1}) including terminal
    observations (the runner evaluates V on the pre-reset obs), so the delta
    is exact through truncations. ``terminated`` zeroes the bootstrap term;
    ``done`` stops advantage accumulation across episode boundaries.

    Returns (advantages, v_targets = advantages + values).
    """
    nonterminal = 1.0 - terminated.astype(rewards.dtype)
    deltas = rewards + gamma * nonterminal * next_values - values
    continues = 1.0 - done.astype(rewards.dtype)

    def body(carry, inp):
        delta, cont = inp
        adv = delta + gamma * lambd * cont * carry
        return adv, adv

    _, advs = jax.lax.scan(
        body, jnp.zeros_like(deltas[-1]), (deltas, continues), reverse=True
    )
    return advs, advs + values


def lambda_returns(
    rewards: jax.Array,
    next_values: jax.Array,
    terminated: jax.Array,
    done: jax.Array,
    gamma: float,
    lambd: float,
) -> jax.Array:
    """TD(lambda) targets: ``G_t = r + gamma * ((1-l) V' + l G_{t+1})``."""
    nonterminal = 1.0 - terminated.astype(rewards.dtype)
    continues = 1.0 - done.astype(rewards.dtype)

    def body(carry, inp):
        r, v_next, nonterm, cont = inp
        mixed = (1.0 - lambd) * v_next + lambd * jnp.where(cont > 0, carry, v_next)
        g = r + gamma * nonterm * mixed
        return g, g

    _, gs = jax.lax.scan(
        body,
        next_values[-1],
        (rewards, next_values, nonterminal, continues),
        reverse=True,
    )
    return gs


def n_step_returns_from_window(
    rewards: jax.Array,
    terminals: jax.Array,
    gamma: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fold an n-step reward window (batch_experiences parity).

    Args:
        rewards: ``[B, n]`` rewards of up-to-n successive steps.
        terminals: ``[B, n]`` terminated flags for those steps.

    Returns:
        (folded_reward [B], discount [B] = gamma^k with k = steps actually
        used, is_terminal [B] whether the window hit a termination) —
        exactly the reward folding of pfrl/replay_buffer.py:183-206, as a
        cumulative-product mask instead of per-sample Python loops.
    """
    n = rewards.shape[1]
    # valid[b, i] — step i contributes: no termination strictly before i.
    term_before = jnp.cumsum(
        jnp.pad(terminals[:, : n - 1], ((0, 0), (1, 0))), axis=1
    )
    valid = term_before == 0
    discounts = gamma ** jnp.arange(n, dtype=rewards.dtype)
    folded = jnp.sum(rewards * valid * discounts, axis=1)
    steps = jnp.sum(valid, axis=1)
    is_terminal = jnp.any(terminals & valid, axis=1)
    return folded, gamma**steps.astype(rewards.dtype), is_terminal
