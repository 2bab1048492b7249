"""Device-resident replay buffers (reference parity: pfrl/replay_buffers/ + pfrl/collections/)."""

from pfrl_tpu.replay.prioritized import (
    PrioritizedReplayBuffer,
    PrioritizedReplayState,
)
from pfrl_tpu.replay.transition import Transition, TransitionBatch
from pfrl_tpu.replay.uniform import ReplayBuffer, ReplayState

__all__ = [
    "PrioritizedReplayBuffer",
    "PrioritizedReplayState",
    "Transition",
    "TransitionBatch",
    "ReplayBuffer",
    "ReplayState",
]
