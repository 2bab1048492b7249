"""Per-episode prioritized episodic replay.

Reference parity: pfrl/replay_buffers/prioritized_episodic.py:9-80 —
episodes carry priorities (default max-so-far), sampled proportionally with
an optional uniform mixture; priorities updated after the learner reports
errors. Implemented as the episodic block buffer plus a dense sum tree over
episode rows.
"""

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.replay import sum_tree
from pfrl_tpu.replay.episodic import (
    EpisodeBatch,
    EpisodicReplayBuffer,
    EpisodicReplayState,
)
from pfrl_tpu.replay.transition import Transition


@struct.dataclass
class PrioritizedEpisodicReplayState:
    base: EpisodicReplayState
    tree: jax.Array
    max_priority: jax.Array

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "base"), name)


class PrioritizedEpisodicReplayBuffer(EpisodicReplayBuffer):
    def __init__(
        self,
        max_episodes: int,
        max_episode_len: int,
        num_lanes: int = 1,
        uniform_ratio: float = 0.1,
        alpha: float = 1.0,
        eps: float = 1e-3,
        subseq_len=None,
        store_carries: bool = True,
    ):
        super().__init__(
            max_episodes,
            max_episode_len,
            num_lanes,
            subseq_len=subseq_len,
            store_carries=store_carries,
        )
        self.uniform_ratio = uniform_ratio
        self.alpha = alpha
        self.eps = eps
        self.tree_capacity = sum_tree.tree_capacity(max_episodes)

    def configure_lanes(self, num_lanes: int):
        return PrioritizedEpisodicReplayBuffer(
            self.max_episodes,
            self.max_episode_len,
            num_lanes,
            uniform_ratio=self.uniform_ratio,
            alpha=self.alpha,
            eps=self.eps,
            subseq_len=self.subseq_len,
            store_carries=self._store_carries,
        )

    def init(self, example: Transition) -> PrioritizedEpisodicReplayState:
        return PrioritizedEpisodicReplayState(
            base=super().init(example),
            tree=sum_tree.init_tree(self.tree_capacity),
            max_priority=jnp.ones((), jnp.float32),
        )

    def add(self, state, batch: Transition):
        old = state.base
        new_base = super().add(old, batch)
        # Episodes that just finished become sampleable at max priority;
        # rows recycled for new episodes drop to zero.
        rows = old.lane_row
        ended = batch.done
        tree = state.tree
        tree = sum_tree.update(
            tree,
            rows,
            jnp.where(ended, state.max_priority, sum_tree.get(tree, rows)),
        )
        next_rows = new_base.lane_row
        recycled = next_rows != rows
        tree = sum_tree.update(
            tree,
            next_rows,
            jnp.where(recycled, 0.0, sum_tree.get(tree, next_rows)),
        )
        return PrioritizedEpisodicReplayState(
            base=new_base, tree=tree, max_priority=state.max_priority
        )

    def sample_episodes(
        self, state, rng: jax.Array, n_episodes: int, max_len: int = None
    ) -> EpisodeBatch:
        rng_p, rng_u, rng_mix, rng_off = jax.random.split(rng, 4)
        prioritized = sum_tree.stratified_sample(state.tree, rng_p, n_episodes)
        finished = state.base.finished.astype(jnp.float32)
        uniform = jax.random.categorical(
            rng_u, jnp.log(finished + 1e-20), shape=(n_episodes,)
        )
        use_uniform = jax.random.uniform(rng_mix, (n_episodes,)) < self.uniform_ratio
        idx = jnp.where(use_uniform, uniform, prioritized)
        T = max_len or self.subseq_len or self.max_episode_len
        return self._gather_windows(state.base, rng_off, idx, T)

    def update_episode_priorities(self, state, rows, errors):
        prio = (jnp.abs(errors) + self.eps) ** self.alpha
        return state.replace(
            tree=sum_tree.update(state.tree, rows, prio),
            max_priority=jnp.maximum(state.max_priority, jnp.max(prio)),
        )

    # ------------------------------------------------------- storage split
    def split_storage(self, state):
        return (
            state.replace(base=state.base.replace(storage=None)),
            state.base.storage,
        )

    def merge_storage(self, light, storage):
        return light.replace(base=light.base.replace(storage=storage))
