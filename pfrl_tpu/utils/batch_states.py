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


def atari_phi(x):
    """Dtype-aware Atari feature map: ``uint8 -> float32 / 255``.

    Float input passes through unchanged, so the same ``phi`` composes with
    replay buffers configured with ``fused_dequant_scale=1/255`` (the fused
    Pallas gather already dequantized the minibatch) while still scaling
    raw uint8 frames on the act path. The dtype branch resolves at trace
    time — zero runtime cost. Reference behavior: the examples' `phi`
    (examples/atari/reproduction/dqn/train_dqn.py) applied uniformly.
    """
    import jax.numpy as jnp

    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x
