"""Tests for the device-resident Atari actor-learner pipeline.

Mirrors the reference's actor-learner test intent
(tests/agents_tests/basetest_training.py:178-289: actors feed a learner,
updates happen, training survives the full lifecycle) for the
process-actor + shm + device-stacking path
(pfrl_tpu/parallel/atari_pipeline.py).
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from pfrl_tpu.agents import DQNCore
from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
from pfrl_tpu.parallel.atari_pipeline import AtariActorLearnerPipeline
from pfrl_tpu.q_functions import DiscreteActionValueHead
from pfrl_tpu.utils import atari_phi

N_ACTIONS = 4


class TinyQ(nn.Module):
    """Small Q-net so the CPU test runs fast (the pipeline is
    model-agnostic; bench uses the NatureCNN)."""

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        h = nn.relu(nn.Dense(32)(x))
        return DiscreteActionValueHead()(nn.Dense(N_ACTIONS)(h))


class FakePlaneEnv:
    """Deterministic [84,84,1]-uint8-plane env with short episodes."""

    def __init__(self, seed=0, ep_len=9):
        self._seed = seed
        self._ep_len = ep_len
        self._t = 0

    def reset(self, **kwargs):
        self._t = 0
        return self._frame()

    def _frame(self):
        v = (self._seed * 31 + self._t) % 251
        return np.full((84, 84, 1), v, np.uint8)

    def step(self, action):
        self._t += 1
        done = self._t >= self._ep_len
        return self._frame(), float(action % 2), done, {}

    def close(self):
        pass


def make_fake_env(seed=0):
    return FakePlaneEnv(seed)


def _make_core():
    return DQNCore(
        model=TinyQ(),
        optimizer=optax.adam(1e-3),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 10_000, N_ACTIONS),
        gamma=0.9,
        phi=atari_phi,
    )


def _make_pipeline(**kw):
    cfg = dict(
        core=_make_core(),
        env_factory=make_fake_env,
        n_workers=2,
        lanes_per_worker=4,
        capacity=4_096,
        minibatch_size=8,
        update_interval=4,
        target_update_interval=64,
        replay_start_size=128,
        burst=8,
        slot_ring=3,
        seed=0,
    )
    cfg.update(kw)
    return AtariActorLearnerPipeline(**cfg)


# --------------------------------------------------------------- unit: sample
def test_sample_reconstructs_stacks_with_boundary_masking():
    """Sampled 4-stacks must equal a numpy reconstruction that repeats the
    oldest same-episode plane across episode boundaries (host
    FrameStack-after-reset semantics, atari_wrappers.py:180-204)."""
    p = _make_pipeline(n_workers=1, lanes_per_worker=2, capacity=256)
    p._build_jits()
    p._init_device_state(jax.random.PRNGKey(0))
    L, cap, k = p.L, p.capacity, p.stack_k

    rng = np.random.RandomState(0)
    n_rows = 40  # vector steps committed
    planes = rng.randint(0, 255, (n_rows * L, 84 * 84), np.uint8)
    done = np.zeros(n_rows * L, bool)
    # Episode boundaries at assorted per-lane steps.
    for lane, step in [(0, 5), (0, 12), (1, 7), (1, 8), (0, 30), (1, 31)]:
        done[step * L + lane] = True
    ring = p.ring.replace(
        planes=jnp.asarray(planes),
        done=jnp.zeros((cap,), bool).at[: n_rows * L].set(jnp.asarray(done)),
        terminated=jnp.zeros((cap,), bool).at[: n_rows * L].set(
            jnp.asarray(done)
        ),
        reward=jnp.zeros((cap,)).at[: n_rows * L].set(1.0),
        action=jnp.arange(cap, dtype=jnp.int32) % N_ACTIONS,
        commit_cursor=jnp.asarray(n_rows * L, jnp.int32),
    )
    batch = p._jit_sample(ring, jax.random.PRNGKey(3))
    ids = np.asarray(batch.indices)
    obs = np.asarray(batch.obs)
    nobs = np.asarray(batch.next_obs)

    def np_stack(r):
        chans = []
        # offsets k-1 (oldest) .. 0 (newest), clamped at boundary
        m = 0
        for j in range(1, k):
            if done[r - j * L]:
                break
            m = j
        for j in range(k - 1, -1, -1):
            chans.append(planes[r - min(j, m) * L].reshape(84, 84))
        return np.stack(chans, axis=-1)

    for b, r in enumerate(ids):
        np.testing.assert_array_equal(obs[b], np_stack(int(r)))
        # next_obs: reset stack if this row ended the episode.
        if done[int(r)]:
            expect = np.repeat(
                planes[int(r) + L].reshape(84, 84, 1), k, axis=-1
            )
            np.testing.assert_array_equal(nobs[b], expect)
        else:
            np.testing.assert_array_equal(nobs[b], np_stack(int(r) + L))
        assert bool(batch.is_terminal[b]) == bool(done[int(r)])


def test_act_stage_stack_rolls_and_resets():
    p = _make_pipeline(n_workers=1, lanes_per_worker=2, capacity=256)
    p._build_jits()
    p._init_device_state(jax.random.PRNGKey(0))
    K = p.K

    def plane(v):
        return np.full((K, 84 * 84), v, np.uint8)

    # Step 0: reset frames -> stack = 4x plane.
    a, p.stack, p.ring = p._jit_act_stage(
        p.train_state, p.stack, p.ring, jnp.asarray(plane(7)),
        jnp.ones((K,), bool), np.int32(0), np.int32(0), np.int32(0),
        np.int32(0),
    )
    np.testing.assert_array_equal(
        np.asarray(p.stack)[0, 0, 0], [7, 7, 7, 7]
    )
    # Step 1: no reset -> roll, newest at channel -1.
    a, p.stack, p.ring = p._jit_act_stage(
        p.train_state, p.stack, p.ring, jnp.asarray(plane(9)),
        jnp.zeros((K,), bool), np.int32(0), np.int32(p.L), np.int32(p.L),
        np.int32(1),
    )
    np.testing.assert_array_equal(
        np.asarray(p.stack)[0, 0, 0], [7, 7, 7, 9]
    )
    # Planes + actions staged at their rows.
    np.testing.assert_array_equal(
        np.asarray(p.ring.planes[: 2 * p.L, 0]), [7, 7, 9, 9]
    )


# ---------------------------------------------------------------- end-to-end
def test_pipeline_end_to_end_learns_and_shuts_down():
    p = _make_pipeline()
    p.start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and p.optim_t < 16:
            assert not p.exception_event.is_set()
            time.sleep(0.25)
    finally:
        p.stop()
    assert not p.exception_event.is_set()
    assert p.acted_steps >= p.replay_start_size
    assert p.optim_t >= 16
    stats = dict(p.get_statistics())
    assert np.isfinite(stats["average_loss"])
    # Learner paced at acted/update_interval (never ahead).
    assert p.optim_t <= p.acted_steps // p.update_interval


def test_pipeline_worker_crash_sets_exception_event():
    p = _make_pipeline(env_factory=_exploding_env)
    p.start()
    try:
        deadline = time.time() + 60
        # Workers die at construction; the io loop should notice EOF and
        # not hang the host. (No exception event is required for a clean
        # worker exit, but the pipeline must shut down without deadlock.)
        while time.time() < deadline and any(
            w.is_alive() for w in p._workers
        ):
            time.sleep(0.2)
        assert not any(w.is_alive() for w in p._workers)
    finally:
        p.stop()


def _exploding_env(seed=0):
    raise RuntimeError("boom")


def test_pipeline_eval_and_checkpoint_roundtrip(tmp_path):
    """greedy_actions + save/load: restored params act identically."""
    p = _make_pipeline(n_workers=1, lanes_per_worker=2, capacity=256)
    p._build_jits()
    p._init_device_state(jax.random.PRNGKey(0))
    obs = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (3, 84, 84, 4), 0, 255),
        np.uint8,
    )
    a1 = p.greedy_actions(obs)
    assert a1.shape == (3,)
    p.save(str(tmp_path / "ckpt"))
    # Perturb, then restore; actions must match the saved policy again.
    p.train_state = jax.tree.map(
        lambda x: x + 1 if x.dtype.kind == "f" else x, p.train_state
    )
    p.load(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(p.greedy_actions(obs), a1)


def test_sample_window_respects_wraparound_and_staging_margin():
    """After the ring wraps, sampled ids must stay inside
    [cursor - cap + (R+k+1)L, cursor - L): old rows that in-flight act
    calls may be overwriting are excluded, and the successor row needed
    for next_obs is always committed."""
    p = _make_pipeline(n_workers=1, lanes_per_worker=2, capacity=64)
    p._build_jits()
    p._init_device_state(jax.random.PRNGKey(0))
    L, cap, k, R = p.L, p.capacity, p.stack_k, p.R
    cursor = cap * 3 + 10 * L  # well past several wraps
    ring = p.ring.replace(commit_cursor=jnp.asarray(cursor, jnp.int32))
    lo = cursor - cap + (R + k + 1) * L
    hi = cursor - L
    for s in range(8):
        ids = np.asarray(p._jit_sample(ring, jax.random.PRNGKey(s)).indices)
        assert (ids >= lo).all() and (ids < hi).all(), (ids.min(), ids.max())


def test_sample_window_respects_stack_history_at_start():
    """Before any wrap, ids never reach back past the (k-1) predecessor
    rows a stack reconstruction needs."""
    p = _make_pipeline(n_workers=1, lanes_per_worker=2, capacity=256)
    p._build_jits()
    p._init_device_state(jax.random.PRNGKey(0))
    L, k = p.L, p.stack_k
    cursor = 30 * L
    ring = p.ring.replace(commit_cursor=jnp.asarray(cursor, jnp.int32))
    ids = np.asarray(p._jit_sample(ring, jax.random.PRNGKey(0)).indices)
    assert (ids >= (k - 1) * L).all() and (ids < cursor - L).all()
