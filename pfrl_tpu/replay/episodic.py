"""Episodic device replay buffer.

Reference parity: pfrl/replay_buffers/episodic.py:9-99 (whole-episode
storage + ``sample_episodes(n, max_len)``) — re-expressed with static
shapes: a fixed ``[max_episodes, max_len, ...]`` block with per-episode
lengths, per-lane episode routing, and padded/masked episode sampling.
Replaces pfrl's PackedSequence pipeline for recurrent agents
(SURVEY.md §7 hard part (f)).
"""

from typing import Any, Tuple

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
    finished: jax.Array        # [E] bool episode complete
    lane_row: jax.Array        # [num_lanes] row each lane is writing
    n_started: jax.Array       # monotonic count of episodes started
    item_shapes: Any = struct.field(pytree_node=False, default=None)

    @property
    def n_finished(self) -> jax.Array:
        return jnp.sum(self.finished.astype(jnp.int32))


@struct.dataclass
class EpisodeBatch:
    """Padded sampled episodes ``[B, T, ...]`` with validity mask."""

    transitions: Transition
    mask: jax.Array            # [B, T] float32 1 where valid
    lengths: jax.Array         # [B]


class EpisodicReplayBuffer:
    """See module docstring. Subclassed by PrioritizedEpisodicReplayBuffer
    (per-episode priorities) and PersistentEpisodicReplayBuffer (disk
    snapshots)."""

    def __init__(
        self,
        max_episodes: int,
        max_episode_len: int,
        num_lanes: int = 1,
    ):
        assert max_episodes > 2 * num_lanes, (
            "need headroom: lanes occupy rows while writing"
        )
        self.max_episodes = max_episodes
        self.max_episode_len = max_episode_len
        self.num_lanes = num_lanes

    @property
    def wants_next_obs(self) -> bool:
        """Buffer-protocol flag (see ReplayBuffer.wants_next_obs):
        episodic storage keeps whole trajectories, next_obs included."""
        return True

    def configure_lanes(self, num_lanes: int) -> "EpisodicReplayBuffer":
        return EpisodicReplayBuffer(
            self.max_episodes, self.max_episode_len, num_lanes
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
            lane_row=jnp.arange(self.num_lanes, dtype=jnp.int32),
            n_started=jnp.asarray(self.num_lanes, jnp.int32),
            item_shapes=jax.tree.map(
                lambda x: ItemShape(jnp.shape(x)), example
            ),
        )

    # ------------------------------------------------------------------- add
    def add(self, state: EpisodicReplayState, batch: Transition) -> EpisodicReplayState:
        """Append one step per lane; rotate rows on episode end.

        Episodes longer than max_episode_len keep the first L steps
        (the reference truncates subsequences the same way via max_len).
        """
        lanes = self.num_lanes
        rows = state.lane_row                     # [lanes]
        pos = state.ep_len[rows]                  # [lanes]
        writable = pos < self.max_episode_len
        safe_pos = jnp.minimum(pos, self.max_episode_len - 1)

        def write(s, x):
            if x.ndim > 1:
                x = x.reshape(x.shape[0], -1)  # flat storage layout
            cur = s[rows, safe_pos]
            val = jnp.where(
                writable.reshape((lanes,) + (1,) * (x.ndim - 1)), x, cur
            )
            return s.at[rows, safe_pos].set(val)

        storage = jax.tree.map(write, state.storage, batch)
        ep_len = state.ep_len.at[rows].set(pos + writable.astype(jnp.int32))

        ended = batch.done                        # [lanes]
        finished = state.finished.at[rows].set(
            state.finished[rows] | ended
        )
        # Assign fresh rows to lanes whose episode ended.
        n_new = jnp.cumsum(ended.astype(jnp.int32))
        new_rows = (state.n_started + n_new - 1) % self.max_episodes
        next_rows = jnp.where(ended, new_rows, rows)
        # Recycle: the incoming rows start empty and unfinished.
        ep_len = ep_len.at[next_rows].set(
            jnp.where(ended, 0, ep_len[next_rows])
        )
        finished = finished.at[next_rows].set(
            jnp.where(ended, False, finished[next_rows])
        )
        return state.replace(
            storage=storage,
            ep_len=ep_len,
            finished=finished,
            lane_row=next_rows,
            n_started=state.n_started + n_new[-1] if lanes else state.n_started,
        )

    # ---------------------------------------------------------------- sample
    def sample_episodes(
        self,
        state: EpisodicReplayState,
        rng: jax.Array,
        n_episodes: int,
        max_len: int = None,
    ) -> EpisodeBatch:
        """Uniformly sample finished episodes, padded to ``max_len``
        (default: full max_episode_len). Sampling weight is uniform per
        episode (episodic.py:48-54)."""
        T = max_len or self.max_episode_len
        probs = state.finished.astype(jnp.float32)
        idx = jax.random.categorical(
            rng, jnp.log(probs + 1e-20), shape=(n_episodes,)
        )
        lengths = jnp.minimum(state.ep_len[idx], T)

        def take(s, shape):
            sub = s[idx]                          # [B, L, prod]
            sub = sub[:, :T] if T <= sub.shape[1] else sub
            return sub.reshape(sub.shape[:2] + shape.shape)

        transitions = jax.tree.map(take, state.storage, state.item_shapes)
        t_iota = jnp.arange(T, dtype=jnp.int32)[None, :]
        mask = (t_iota < lengths[:, None]).astype(jnp.float32)
        return EpisodeBatch(transitions=transitions, mask=mask, lengths=lengths)

    # ------------------------------------------------------- storage split
    # See ReplayBuffer.split_storage: keeps the episode storage out of
    # lax.cond/fori_loop carries so XLA never copies it.
    def split_storage(self, state):
        return state.replace(storage=None), state.storage

    def merge_storage(self, light, storage):
        return light.replace(storage=storage)
