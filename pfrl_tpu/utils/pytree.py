"""Pytree manipulation helpers used throughout the functional core.

These replace the reference's in-place tensor utilities
(pfrl/utils/copy_param.py, pfrl/utils/recurrent.py tree walkers) with pure
functions over arbitrary pytrees.
"""

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp


def tree_replace(obj: Any, **changes: Any) -> Any:
    """``dataclasses.replace`` that also works on flax.struct dataclasses."""
    return dataclasses.replace(obj, **changes)


def tree_where(cond: jax.Array, a: Any, b: Any) -> Any:
    """Elementwise select between two identically-structured pytrees.

    ``cond`` is broadcast against each leaf's leading dimensions: a scalar
    selects whole trees, a ``[B]`` bool vector selects per-batch-row.
    """

    def _sel(x, y):
        c = cond
        # Right-pad cond with singleton dims to broadcast over leaf trailing dims.
        while c.ndim < jnp.ndim(x):
            c = c[..., None]
        return jnp.where(c, x, y)

    return jax.tree.map(_sel, a, b)


def tree_select(cond: jax.Array, a: Any, b: Any) -> Any:
    """Whole-tree select on a scalar bool (lax.select semantics, no branching)."""
    return jax.tree.map(lambda x, y: jax.lax.select(cond, x, y), a, b)


def tree_stack(trees: Sequence[Any], axis: int = 0) -> Any:
    """Stack a list of identically-structured pytrees along ``axis``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *trees)


def tree_unstack(tree: Any, axis: int = 0):
    """Inverse of :func:`tree_stack` — returns a list of pytrees."""
    leaves, treedef = jax.tree.flatten(tree)
    n = leaves[0].shape[axis]
    out = []
    for i in range(n):
        out.append(
            jax.tree.unflatten(
                treedef, [jnp.take(leaf, i, axis=axis) for leaf in leaves]
            )
        )
    return out


def tree_zeros_like_batched(tree: Any, batch: int) -> Any:
    """Zeros with an extra leading ``batch`` dimension per leaf."""
    return jax.tree.map(
        lambda x: jnp.zeros((batch,) + jnp.shape(x), jnp.result_type(x)), tree
    )
