"""Global-norm gradient clipping (reference parity: pfrl/utils/clip_l2_grad_norm.py:5-38).

The reference hand-rolls a fast CPU path around torch's clip_grad_norm_;
in optax land this is ``optax.clip_by_global_norm`` chained into the
optimizer, and this function is the pure-pytree equivalent for code that
clips explicitly.
"""

from typing import Any

import jax
import jax.numpy as jnp


def clip_l2_grad_norm(grads: Any, max_norm: float) -> Any:
    norm = jnp.sqrt(
        sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
    )
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)
