"""Pallas replay-kernel correctness: interpreter mode vs pure-XLA paths.

The same kernel code the TPU compiles runs here under the Pallas
interpreter on CPU, pinned against the XLA reference implementations the
buffers use when Pallas is off (VERDICT r1 item 1: kernels must be wired
and tested in both modes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfrl_tpu.ops import pallas_kernels as pk
from pfrl_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer
from pfrl_tpu.replay.transition import Transition


def test_gather_dequant_matches_xla(rng):
    storage = jax.random.randint(rng, (256, 3, 128), 0, 256, dtype=jnp.int32).astype(
        jnp.uint8
    )
    ids = jax.random.randint(jax.random.fold_in(rng, 1), (32,), 0, 256)
    out = pk.gather_rows_dequantize_pallas(
        storage, ids, scale=1.0 / 255.0, out_dtype=jnp.float32, interpret=True
    )
    # Multiply by the f32 reciprocal, matching the kernel (and the buffers'
    # XLA fallback); dividing by 255 differs by 1 ulp on some values.
    ref = storage[ids].astype(jnp.float32) * (1.0 / 255.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)


def test_gather_identity_same_dtype(rng):
    storage = jax.random.randint(rng, (64, 2, 128), 0, 256, dtype=jnp.int32).astype(
        jnp.uint8
    )
    ids = jnp.array([0, 63, 5, 5], jnp.int32)
    out = pk.gather_rows_dequantize_pallas(
        storage, ids, scale=1.0, out_dtype=jnp.uint8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(storage[ids]))


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


@pytest.mark.parametrize("fused", [None, 1.0 / 255.0])
def test_replay_gather_pallas_equals_xla(rng, fused):
    lanes = 4
    kw = dict(num_steps=2, gamma=0.9, num_lanes=lanes, fused_dequant_scale=fused)
    b_pl = ReplayBuffer(512, use_pallas=True, **kw)
    b_xla = ReplayBuffer(512, use_pallas=False, **kw)
    s_pl = _fill(b_pl, rng, lanes=lanes)
    s_xla = _fill(b_xla, rng, lanes=lanes)
    ids = b_xla.sample_indices(s_xla, jax.random.fold_in(rng, 99), 16)
    g_pl = b_pl.gather(s_pl, ids)
    g_xla = b_xla.gather(s_xla, ids)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g_pl,
        g_xla,
    )
    want = jnp.float32 if fused else jnp.uint8
    assert g_pl.obs.dtype == want and g_pl.next_obs.dtype == want


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


def test_fused_per_sample_gather_dequant_matches_composite(rng):
    """The single-launch fused kernel must equal the three-stage XLA
    composite: prefix count -> row gather -> dequantize."""
    C = pk._CHUNK  # 8192 leaves, one chunk
    prio = jax.random.randint(rng, (C,), 0, 4).astype(jnp.float32)
    total = float(jnp.sum(prio))
    targets = jax.random.uniform(
        jax.random.fold_in(rng, 7), (16,), minval=0.0, maxval=total
    )
    storage = jax.random.randint(
        jax.random.fold_in(rng, 8), (C, 8, 128), 0, 255
    ).astype(jnp.uint8)
    idx, out = pk.per_sample_gather_dequantize_pallas(
        prio, targets, storage, scale=1 / 255.0, interpret=True
    )
    ref_idx = pk.prefix_sample_reference(prio, targets)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    ref_out = storage[ref_idx].astype(jnp.float32) / 255.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out))


def test_fused_per_sample_multi_chunk_and_edge_targets(rng):
    C = 2 * pk._CHUNK
    prio = jax.random.randint(rng, (C,), 0, 3).astype(jnp.float32)
    total = float(jnp.sum(prio))
    # Edge: target just inside 0 and just below the total, plus midpoints.
    targets = jnp.asarray(
        [0.0, 0.5, total / 2, total - 0.5], jnp.float32
    )
    storage = jax.random.randint(
        jax.random.fold_in(rng, 9), (C, 8, 128), 0, 255
    ).astype(jnp.uint8)
    idx, out = pk.per_sample_gather_dequantize_pallas(
        prio, targets, storage, scale=1.0, interpret=True
    )
    ref_idx = np.clip(
        np.asarray(pk.prefix_sample_reference(prio, targets)), 0, C - 1
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(storage)[ref_idx].astype(np.float32)
    )
