"""Host-side env wrappers (reference parity: pfrl/wrappers/).

These wrap *host* envs (our Env protocol or gym-compatible objects) feeding
the batched drivers. Pure-JAX envs use the functional wrappers in
pfrl_tpu/envs/wrappers.py instead. Atari wrappers live in
``atari_wrappers`` and gate their cv2 dependency at call time.
"""

from pfrl_tpu.wrappers import atari_wrappers
from pfrl_tpu.wrappers.continuing_time_limit import ContinuingTimeLimit
from pfrl_tpu.wrappers.misc import (
    CastObservation,
    CastObservationToFloat32,
    NormalizeActionSpace,
    RandomizeAction,
    ScaleReward,
)
from pfrl_tpu.wrappers.monitor import Monitor, Render
from pfrl_tpu.wrappers.vector_frame_stack import LazyFrames, VectorFrameStack

__all__ = [
    "atari_wrappers",
    "ContinuingTimeLimit",
    "CastObservation",
    "CastObservationToFloat32",
    "NormalizeActionSpace",
    "RandomizeAction",
    "ScaleReward",
    "Monitor",
    "Render",
    "LazyFrames",
    "VectorFrameStack",
]
