"""Device-resident replay buffers (reference parity: pfrl/replay_buffers/ + pfrl/collections/)."""

from pfrl_tpu.replay.episodic import (
    EpisodeBatch,
    EpisodicReplayBuffer,
    EpisodicReplayState,
)
from pfrl_tpu.replay.persistent import (
    PersistentEpisodicReplayBuffer,
    PersistentReplayBuffer,
    load_state,
    save_state,
)
from pfrl_tpu.replay.prioritized import (
    PrioritizedReplayBuffer,
    PrioritizedReplayState,
)
from pfrl_tpu.replay.prioritized_episodic import (
    PrioritizedEpisodicReplayBuffer,
)
from pfrl_tpu.replay.transition import Transition, TransitionBatch
from pfrl_tpu.replay.uniform import ReplayBuffer, ReplayState

__all__ = [
    "EpisodeBatch",
    "EpisodicReplayBuffer",
    "EpisodicReplayState",
    "PersistentEpisodicReplayBuffer",
    "PersistentReplayBuffer",
    "load_state",
    "save_state",
    "PrioritizedReplayBuffer",
    "PrioritizedReplayState",
    "PrioritizedEpisodicReplayBuffer",
    "Transition",
    "TransitionBatch",
    "ReplayBuffer",
    "ReplayState",
]
