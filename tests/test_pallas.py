"""Pallas PER-sampling kernel correctness: interpreter mode vs XLA.

The same kernel code the TPU compiles runs here under the Pallas
interpreter on CPU, pinned against the XLA reference implementation the
PER buffer uses when Pallas is off. Only the streaming prefix-sum kernel
survives round 4's win-or-cut (pfrl_tpu/ops/pallas_kernels.py documents
the measured verdict; the row-gather and fused kernels were deleted).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfrl_tpu.ops import pallas_kernels as pk
from pfrl_tpu.replay import PrioritizedReplayBuffer
from pfrl_tpu.replay.transition import Transition


def test_prefix_sample_matches_reference(rng):
    # Integer-valued f32 priorities sum exactly in both the kernel's MXU
    # triangular prefix and XLA's cumsum, so index equality is exact.
    prio = jax.random.randint(rng, (pk._CHUNK,), 0, 5).astype(jnp.float32)
    total = float(jnp.sum(prio))
    targets = jax.random.uniform(
        jax.random.fold_in(rng, 1), (64,), minval=0.0, maxval=total
    )
    out = pk.prefix_sample_pallas(prio, targets, interpret=True)
    ref = pk.prefix_sample_reference(prio, targets)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_prefix_sample_multi_chunk(rng):
    prio = jax.random.randint(rng, (2 * pk._CHUNK,), 0, 3).astype(jnp.float32)
    total = float(jnp.sum(prio))
    targets = jnp.linspace(0.1, total - 0.1, 17)
    out = pk.prefix_sample_pallas(prio, targets, interpret=True)
    ref = pk.prefix_sample_reference(prio, targets)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _tr(obs, a, r, next_obs, done):
    return Transition(
        obs=obs,
        action=jnp.asarray(a, jnp.int32),
        reward=jnp.asarray(r, jnp.float32),
        next_obs=next_obs,
        done=jnp.asarray(done),
        terminated=jnp.asarray(done),
        extras={},
    )


def _fill(buf, rng, n=40, lanes=4):
    ex = _tr(jnp.zeros((8, 8, 4), jnp.uint8), 0, 0.0, jnp.zeros((8, 8, 4), jnp.uint8), False)
    state = buf.init(ex)
    for i in range(n):
        k = jax.random.fold_in(rng, i)
        obs = jax.random.randint(k, (lanes, 8, 8, 4), 0, 256, dtype=jnp.int32).astype(
            jnp.uint8
        )
        batch = _tr(
            obs,
            jnp.arange(lanes, dtype=jnp.int32),
            jnp.arange(lanes, dtype=jnp.float32) + i,
            obs + 1,
            jnp.arange(lanes) % 7 == 3,
        )
        state = buf.add(state, batch)
    return state


@pytest.mark.slow
def test_per_sample_pallas_equals_descent(rng):
    lanes = 4
    kw = dict(capacity=8192, num_lanes=lanes, betasteps=1000)
    b_pl = PrioritizedReplayBuffer(use_pallas=True, **kw)
    b_xla = PrioritizedReplayBuffer(use_pallas=False, **kw)
    assert b_pl.tree_capacity % pk._CHUNK == 0
    s_pl = _fill(b_pl, rng, n=60, lanes=lanes)
    s_xla = _fill(b_xla, rng, n=60, lanes=lanes)
    # Feed back some priorities so the tree is non-uniform.
    slots = jnp.arange(0, 200, 3, dtype=jnp.int32)
    errs = jax.random.uniform(jax.random.fold_in(rng, 7), slots.shape)
    s_pl = b_pl.update_priorities(s_pl, slots, errs)
    s_xla = b_xla.update_priorities(s_xla, slots, errs)
    for i in range(3):
        k = jax.random.fold_in(rng, 100 + i)
        batch_pl, s_pl = b_pl.sample(s_pl, k, 32)
        batch_xla, s_xla = b_xla.sample(s_xla, k, 32)
        np.testing.assert_array_equal(
            np.asarray(batch_pl.indices), np.asarray(batch_xla.indices)
        )
        np.testing.assert_allclose(
            np.asarray(batch_pl.weight), np.asarray(batch_xla.weight), rtol=1e-6
        )
