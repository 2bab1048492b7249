"""Observation collation (reference parity: pfrl/utils/batch_states.py:18-36).

The reference stacks a python list of observations into a torch tensor and
moves it to the GPU each step. Here ``batch_states`` produces a numpy array
(device transfer happens once, inside the jitted act function), and pure-JAX
envs never call it at all — their observations are already batched device
arrays.
"""

from typing import Any, Callable, Sequence

import jax
import numpy as np


def _to_numpy_stack(xs):
    return np.stack([np.asarray(x) for x in xs])


def batch_states(states: Sequence[Any], phi: Callable[[Any], Any] = lambda x: x):
    """Collate a sequence of (possibly pytree) observations, applying ``phi``.

    Returns numpy pytrees; the caller's jitted function performs the single
    host->device transfer.
    """
    features = [phi(s) for s in states]
    return jax.tree.map(lambda *xs: _to_numpy_stack(xs), *features)
