"""Running observation normalization.

Reference parity: pfrl/nn/empirical_normalization.py:6-106. The reference
mutates buffers inside a torch Module; here the statistics are an explicit
``NormalizerState`` pytree with pure ``update`` / ``normalize`` / ``inverse``
functions, so the update can run inside the jitted training step (and be
``psum``-reduced across a mesh when env batches are sharded).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalizerState:
    mean: jax.Array
    var: jax.Array
    count: jax.Array  # float32 number of samples absorbed


class EmpiricalNormalization:
    """Normalize by the empirical mean/std of everything seen so far.

    Args mirror the reference: ``until`` caps how many samples update the
    statistics; ``clip_threshold`` clips normalized outputs.
    """

    def __init__(
        self,
        shape: Tuple[int, ...],
        eps: float = 1e-2,
        until: Optional[int] = None,
        clip_threshold: Optional[float] = 5.0,
    ):
        self.shape = shape
        self.eps = eps
        self.until = until
        self.clip_threshold = clip_threshold

    def init(self) -> NormalizerState:
        return NormalizerState(
            mean=jnp.zeros(self.shape, jnp.float32),
            var=jnp.ones(self.shape, jnp.float32),
            count=jnp.zeros((), jnp.float32),
        )

    def update(self, state: NormalizerState, batch: jax.Array) -> NormalizerState:
        """Absorb a batch ``[B, *shape]`` via Chan's parallel-merge update."""
        b = jnp.float32(batch.shape[0])
        batch_mean = jnp.mean(batch, axis=0)
        batch_var = jnp.var(batch, axis=0)
        count = state.count + b
        delta = batch_mean - state.mean
        new_mean = state.mean + (b / count) * delta
        m_a = state.var * state.count
        m_b = batch_var * b
        m2 = m_a + m_b + delta**2 * state.count * b / count
        new_var = m2 / count
        new = NormalizerState(mean=new_mean, var=new_var, count=count)
        if self.until is not None:
            frozen = state.count >= self.until
            new = jax.tree.map(
                lambda old, nv: jnp.where(frozen, old, nv), state, new
            )
        return new

    def normalize(self, state: NormalizerState, x: jax.Array) -> jax.Array:
        std = jnp.sqrt(state.var)
        out = (x - state.mean) / (std + self.eps)
        if self.clip_threshold is not None:
            out = jnp.clip(out, -self.clip_threshold, self.clip_threshold)
        return out

    def __call__(self, state: NormalizerState, x: jax.Array) -> jax.Array:
        return self.normalize(state, x)

    def inverse(self, state: NormalizerState, y: jax.Array) -> jax.Array:
        std = jnp.sqrt(state.var)
        return y * (std + self.eps) + state.mean
