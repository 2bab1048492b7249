"""Episodic device replay buffer with random-offset subsequence replay.

Reference parity: pfrl/replay_buffers/episodic.py:9-99 (whole-episode
storage + ``sample_episodes(n, max_len)``) and pfrl/replay_buffer.py:149-154
(``random_subseq``: a uniformly-random offset window of ``max_len`` steps,
the whole episode when shorter). Re-expressed with static shapes: a fixed
``[max_rows, chunk_len, ...]`` block with per-row lengths.

Two deliberate departures from the reference, both TPU-shaped:

* **Chunked long episodes.** Episodes longer than ``max_episode_len`` are
  not truncated: when a lane's row fills mid-episode the row is sealed
  (becomes sampleable) and the episode continues in a fresh row. Any
  window within a chunk replays exactly like a window within an episode
  because every transition stores the behavior-time recurrent carry (see
  below) — a chunk boundary is just another valid window start. The cost
  is that episode sampling weight becomes proportional to
  ``ceil(len / chunk_len)`` instead of uniform-per-episode (uniform over
  stored *data* rather than over episodes).

* **Stored carries ride in ``Transition.extras``.** The reference snapshots
  the recurrent state into each transition (pfrl/agents/dqn.py:533-543,
  ``recurrent_state`` / ``next_recurrent_state``) so a replayed subsequence
  warm-starts mid-episode (pfrl/utils/recurrent.py:143-177). Here the
  runner writes ``extras={"carry": <pre-step>, "next_carry": <post-step>}``
  per step; :meth:`EpisodeBatch.init_carry` / ``next_init_carry`` gather the
  window-start snapshots for the online / target unrolls.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.replay.transition import Transition
from pfrl_tpu.replay.uniform import ItemShape


@struct.dataclass
class EpisodicReplayState:
    storage: Transition        # [E, L, prod(shape)] per leaf (flattened; see
                               # uniform.ItemShape for the layout rationale)
    ep_len: jax.Array          # [E] int32 written steps per row
    finished: jax.Array        # [E] bool row sealed (episode done OR chunk full)
    lane_row: jax.Array        # [num_lanes] row each lane is writing
    n_started: jax.Array       # monotonic count of rows started
    item_shapes: Any = struct.field(pytree_node=False, default=None)

    @property
    def n_finished(self) -> jax.Array:
        return jnp.sum(self.finished.astype(jnp.int32))


@struct.dataclass
class EpisodeBatch:
    """Padded sampled subsequences ``[B, T, ...]`` with validity mask.

    ``rows``/``offsets`` locate each window in the buffer (row index and
    window-start step) for tests and priority feedback.
    """

    transitions: Transition
    mask: jax.Array            # [B, T] float32 1 where valid
    lengths: jax.Array         # [B]
    rows: jax.Array = None     # [B] int32
    offsets: jax.Array = None  # [B] int32

    @property
    def init_carry(self) -> Optional[Any]:
        """Behavior-time recurrent carry at the window start (the carry the
        actor held BEFORE processing ``obs[:, 0]``), or None if the buffer
        stored no carries. Reference: ``recurrent_state`` in
        pfrl/agents/dqn.py:533-538."""
        ex = self.transitions.extras
        if "carry" not in ex:
            return None
        return jax.tree.map(lambda x: x[:, 0], ex["carry"])

    @property
    def next_init_carry(self) -> Optional[Any]:
        """Carry AFTER processing ``obs[:, 0]`` — the warm start for the
        target net's unroll over ``next_obs``. Reference:
        ``next_recurrent_state`` in pfrl/agents/dqn.py:539-543."""
        ex = self.transitions.extras
        if "next_carry" not in ex:
            return None
        return jax.tree.map(lambda x: x[:, 0], ex["next_carry"])


class EpisodicReplayBuffer:
    """See module docstring. Subclassed by PrioritizedEpisodicReplayBuffer
    (per-episode priorities) and PersistentEpisodicReplayBuffer (disk
    snapshots).

    ``subseq_len``: default window length for :meth:`sample_episodes`
    (the reference's ``episodic_update_len``). None replays whole rows.

    Row ownership: each lane recycles within a private contiguous ring of
    ``max_episodes // num_lanes`` rows, so lanes can never collide on a
    row regardless of episode-length skew; ``max_episodes`` should be
    comfortably above ``2 * num_lanes`` so every lane keeps sealed rows
    sampleable while writing its next one.
    """

    def __init__(
        self,
        max_episodes: int,
        max_episode_len: int,
        num_lanes: int = 1,
        subseq_len: Optional[int] = None,
        gamma: float = 0.99,
        store_carries: bool = True,
    ):
        assert max_episodes > 2 * num_lanes, (
            "need headroom: lanes occupy rows while writing"
        )
        self.max_episodes = max_episodes
        self.max_episode_len = max_episode_len
        self.num_lanes = num_lanes
        self.subseq_len = subseq_len
        self.gamma = gamma  # 1-step discount for the flat sample() view
        # store_carries=False skips the per-step recurrent snapshots
        # (2 x [E, L, carry] memory — e.g. ~4 GB for a 2048x128 buffer of
        # 512-unit LSTM carries); replayed windows then warm-start from
        # zeros, which pairs naturally with RecurrentDQNCore(burn_in=K).
        self._store_carries = store_carries

    @property
    def wants_next_obs(self) -> bool:
        """Buffer-protocol flag (see ReplayBuffer.wants_next_obs):
        episodic storage keeps whole trajectories, next_obs included."""
        return True

    @property
    def stores_carries(self) -> bool:
        """The runner writes per-step recurrent carries into extras for
        buffers advertising this (pfrl/agents/dqn.py:533-543 parity)."""
        return self._store_carries

    def configure_lanes(self, num_lanes: int) -> "EpisodicReplayBuffer":
        return EpisodicReplayBuffer(
            self.max_episodes,
            self.max_episode_len,
            num_lanes,
            subseq_len=self.subseq_len,
            gamma=self.gamma,
            store_carries=self._store_carries,
        )

    # ------------------------------------------------------------------ init
    def init(self, example: Transition) -> EpisodicReplayState:
        E, L = self.max_episodes, self.max_episode_len
        storage = jax.tree.map(
            lambda x: jnp.zeros(
                (E, L, int(jnp.size(x))), jnp.result_type(x)
            )
            if jnp.ndim(x) >= 1
            else jnp.zeros((E, L), jnp.result_type(x)),
            example,
        )
        return EpisodicReplayState(
            storage=storage,
            ep_len=jnp.zeros((E,), jnp.int32),
            finished=jnp.zeros((E,), bool),
            lane_row=jnp.arange(self.num_lanes, dtype=jnp.int32)
            * (E // self.num_lanes),
            n_started=jnp.asarray(self.num_lanes, jnp.int32),
            item_shapes=jax.tree.map(
                lambda x: ItemShape(jnp.shape(x)), example
            ),
        )

    # ------------------------------------------------------------------- add
    def add(self, state: EpisodicReplayState, batch: Transition) -> EpisodicReplayState:
        """Append one step per lane; seal + rotate rows on episode end OR
        when a row fills (chunked long-episode storage — nothing is
        truncated; the continuation row's first transition carries the
        live recurrent snapshot, so it replays exactly)."""
        lanes = self.num_lanes
        rows = state.lane_row                     # [lanes]
        pos = state.ep_len[rows]                  # [lanes]
        # Rows rotate on fill, so pos < L always holds; clamp defensively.
        safe_pos = jnp.minimum(pos, self.max_episode_len - 1)

        def write(s, x):
            if x.ndim > 1:
                x = x.reshape(x.shape[0], -1)  # flat storage layout
            return s.at[rows, safe_pos].set(x)

        storage = jax.tree.map(write, state.storage, batch)
        new_pos = pos + 1
        ep_len = state.ep_len.at[rows].set(new_pos)

        ended = batch.done                        # [lanes]
        filled = new_pos >= self.max_episode_len
        seal = ended | filled
        finished = state.finished.at[rows].set(state.finished[rows] | seal)
        # Each lane owns a private contiguous ring of rows_per_lane rows,
        # so recycling can NEVER hand a lane a row another lane is still
        # writing (the old shared n_started ring could collide after
        # wrap-around and silently corrupt an in-progress episode).
        rpl = self.max_episodes // lanes
        base = jnp.arange(lanes, dtype=jnp.int32) * rpl
        new_rows = base + (rows - base + 1) % rpl
        next_rows = jnp.where(seal, new_rows, rows)
        # Recycle: the incoming rows start empty and unsealed.
        ep_len = ep_len.at[next_rows].set(
            jnp.where(seal, 0, ep_len[next_rows])
        )
        finished = finished.at[next_rows].set(
            jnp.where(seal, False, finished[next_rows])
        )
        n_new = jnp.sum(seal.astype(jnp.int32))
        return state.replace(
            storage=storage,
            ep_len=ep_len,
            finished=finished,
            lane_row=next_rows,
            n_started=state.n_started + n_new,
        )

    # ---------------------------------------------------------------- sample
    def _gather_windows(
        self,
        state: EpisodicReplayState,
        rng: jax.Array,
        idx: jax.Array,
        T: int,
    ) -> EpisodeBatch:
        """Random-offset windows of ``T`` steps from rows ``idx``.

        Offset ~ U[0, max(0, row_len - T)] inclusive — exactly the
        reference's ``random_subseq`` (pfrl/replay_buffer.py:149-154):
        rows shorter than T are returned whole (offset 0, masked tail).
        """
        n = idx.shape[0]
        full_len = state.ep_len[idx]              # [B]
        max_off = jnp.maximum(full_len - T, 0)
        u = jax.random.uniform(rng, (n,))
        off = jnp.minimum((u * (max_off + 1)).astype(jnp.int32), max_off)
        t_idx = off[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        t_idx = jnp.minimum(t_idx, self.max_episode_len - 1)

        def take(s, shape):
            sub = s[idx[:, None], t_idx]          # [B, T, prod]
            return sub.reshape((n, T) + shape.shape)

        transitions = jax.tree.map(take, state.storage, state.item_shapes)
        lengths = jnp.minimum(full_len - off, T)
        t_iota = jnp.arange(T, dtype=jnp.int32)[None, :]
        mask = (t_iota < lengths[:, None]).astype(jnp.float32)
        return EpisodeBatch(
            transitions=transitions,
            mask=mask,
            lengths=lengths,
            rows=idx,
            offsets=off,
        )

    def sample_episodes(
        self,
        state: EpisodicReplayState,
        rng: jax.Array,
        n_episodes: int,
        max_len: int = None,
    ) -> EpisodeBatch:
        """Uniformly sample sealed rows, then a random-offset window of
        ``max_len`` (default ``subseq_len``, else the whole row) from each
        — reference ``sample_episodes(n, max_len)`` semantics
        (pfrl/replay_buffers/episodic.py:48-54)."""
        T = max_len or self.subseq_len or self.max_episode_len
        rng_row, rng_off = jax.random.split(rng)
        probs = state.finished.astype(jnp.float32)
        idx = jax.random.categorical(
            rng_row, jnp.log(probs + 1e-20), shape=(n_episodes,)
        )
        return self._gather_windows(state, rng_off, idx, T)

    def sample(self, state: EpisodicReplayState, rng: jax.Array, n: int):
        """Flat transition view: ``n`` uniform single transitions from the
        sealed rows (the reference's ``EpisodicReplayBuffer.sample``,
        pfrl/replay_buffers/episodic.py:44-46 — episodic storage doubles
        as a plain buffer for non-recurrent consumers).

        Returns a :class:`TransitionBatch` with 1-step discounts.
        """
        from pfrl_tpu.replay.transition import TransitionBatch

        rng_row, rng_t = jax.random.split(rng)
        probs = state.finished.astype(jnp.float32) * jnp.maximum(
            state.ep_len.astype(jnp.float32), 0.0
        )  # weight rows by length: uniform over stored transitions
        rows = jax.random.categorical(
            rng_row, jnp.log(probs + 1e-20), shape=(n,)
        )
        u = jax.random.uniform(rng_t, (n,))
        t = jnp.minimum(
            (u * state.ep_len[rows]).astype(jnp.int32),
            jnp.maximum(state.ep_len[rows] - 1, 0),
        )

        def take(s, shape):
            return s[rows, t].reshape((n,) + shape.shape)

        tr = jax.tree.map(take, state.storage, state.item_shapes)
        return TransitionBatch(
            obs=tr.obs,
            action=tr.action,
            reward=tr.reward,
            next_obs=tr.next_obs,
            discount=jnp.full((n,), self.gamma, jnp.float32),
            is_terminal=tr.terminated,
            weight=jnp.ones((n,), jnp.float32),
            indices=rows * self.max_episode_len + t,
            extras=tr.extras,
        )

    # ------------------------------------------------------- storage split
    # See ReplayBuffer.split_storage: keeps the episode storage out of
    # lax.cond/fori_loop carries so XLA never copies it.
    def split_storage(self, state):
        return state.replace(storage=None), state.storage

    def merge_storage(self, light, storage):
        return light.replace(storage=storage)
