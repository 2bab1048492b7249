"""Data-parallel learner updates.

The reference's async A3C gradient push (pfrl/agents/a3c.py:209-221, shared
memory + copy_grad) becomes a synchronous all-reduce: each device computes
grads on its batch shard; ``jax.lax.pmean`` over the mesh axis averages them
over ICI; every device applies the identical update. With
``jax.sharding`` + jit, simply sharding the batch and replicating params
makes XLA insert exactly that collective — this helper exists for the
explicit shard_map form and for tests that pin the collective pattern.
"""

from functools import partial
from typing import Any, Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P


def data_parallel_update(
    mesh: Mesh,
    update_fn: Callable,
    axis: str = "data",
):
    """Wrap ``update_fn(state, rng, batch) -> (state, aux)`` for SPMD.

    ``update_fn`` must compute grads internally via a loss that MEANS over
    the batch; this wrapper shards the batch over ``axis``, replicates
    state, and relies on XLA's automatic gradient all-reduce under jit.
    """
    in_specs = (P(), P(), P(axis))
    out_specs = (P(), P())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    def wrapped(state, rng, batch):
        state, aux = update_fn(state, rng, batch)
        # Average *state deltas* implicitly: grads were computed on the local
        # shard, so pmean the new params' pytree is wrong in general; instead
        # update_fn must be grad-based. We pmean the aux metrics and trust
        # update_fn to pmean its grads. For the common optax pattern, use
        # `pmean_grads` below inside update_fn.
        aux = jax.tree.map(
            lambda x: jax.lax.pmean(x, axis) if hasattr(x, "dtype") else x, aux
        )
        return state, aux

    return wrapped


def pmean_grads(grads: Any, axis: str = "data") -> Any:
    """All-reduce gradients across the mesh axis (inside shard_map/pjit)."""
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
