"""Transition pytrees.

The reference stores transitions as python dicts in host deques
(pfrl/replay_buffers/replay_buffer.py:29-62) and collates them per-update
(pfrl/replay_buffer.py:157-212). Here a transition is a typed pytree; the
buffer preallocates ``[capacity, ...]`` device arrays per leaf, and a
"batch" is the same struct with a leading batch dimension — no collation
step exists at all.
"""

from typing import Any, Dict

import jax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class Transition:
    """One env step. ``extras`` carries algorithm-specific leaves

    (e.g. ACER's behavior-distribution params, recurrent carries) without
    changing the buffer code.
    """

    obs: Any
    action: jax.Array
    reward: jax.Array
    next_obs: Any
    terminated: jax.Array  # true episode end: no bootstrap
    done: jax.Array        # terminated | truncated: episode boundary
    extras: FrozenDict = struct.field(default_factory=FrozenDict)


@struct.dataclass
class TransitionBatch:
    """What off-policy agents consume: n-step-folded sample.

    ``discount`` is gamma^k for the k steps actually folded;
    ``is_terminal`` kills the bootstrap term. ``weight`` is the PER
    importance weight (ones for uniform sampling); ``indices`` lets the
    agent report new priorities back to the buffer (the reference's
    update_errors feedback loop, pfrl/agents/dqn.py:345-356).
    """

    obs: Any
    action: jax.Array
    reward: jax.Array
    next_obs: Any
    discount: jax.Array
    is_terminal: jax.Array
    weight: jax.Array
    indices: jax.Array
    extras: FrozenDict = struct.field(default_factory=FrozenDict)
