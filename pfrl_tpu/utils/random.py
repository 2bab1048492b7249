"""Sampling helpers (reference parity: pfrl/utils/random.py:4-27).

The reference implements ``sample_n_k`` as a partial Fisher-Yates on the
host. On TPU the equivalent is a jitted top-k over random keys
(weighted-reservoir trick), which XLA vectorizes; sampling k of n without
replacement never touches the host.
"""

import jax
import jax.numpy as jnp


def sample_n_k(rng: jax.Array, n: int, k: int) -> jax.Array:
    """Sample ``k`` distinct indices out of ``range(n)`` uniformly.

    Uses Gumbel-top-k: argmax of n iid uniforms is a uniform pick, and the
    top-k of them is a uniform k-subset — one fused kernel, no host loop.
    """
    if k > n:
        raise ValueError(f"cannot sample {k} distinct items from {n}")
    z = jax.random.uniform(rng, (n,))
    _, idx = jax.lax.top_k(z, k)
    return idx


def sample_with_replacement(rng: jax.Array, n: int, k: int) -> jax.Array:
    """Sample ``k`` indices out of ``range(n)`` iid uniformly."""
    return jax.random.randint(rng, (k,), 0, n)
