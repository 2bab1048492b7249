"""Dense array-backed segment (sum) tree, fully jittable.

Replaces the reference's pointer-based SumTreeQueue / MinTreeQueue
(pfrl/collections/prioritized.py:126-258). Fixed capacity (power of two)
gives static shapes: the tree is one ``[2 * capacity]`` array, leaves at
``[capacity, 2*capacity)``. Batched update propagates level-by-level —
log2(capacity) scatters, each parent recomputed from both children, so
duplicate indices in a batch are handled idempotently. Batched sampling is
a vectorized root-to-leaf descent: log2(capacity) gathers, no host sync —
this is the "hard part (a)" of SURVEY.md §7.
"""

import math

import jax
import jax.numpy as jnp


def tree_capacity(n: int) -> int:
    """Round up to a power of two."""
    return 1 << max(1, math.ceil(math.log2(n)))


def init_tree(capacity: int) -> jax.Array:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return jnp.zeros(2 * capacity, jnp.float32)


def update(tree: jax.Array, leaf_indices: jax.Array, values: jax.Array) -> jax.Array:
    """Set leaves and repair all ancestor sums.

    ``leaf_indices`` may contain duplicates (last write wins on the leaf via
    scatter semantics; parents are recomputed from children so they are
    always consistent).
    """
    capacity = tree.shape[0] // 2
    levels = int(math.log2(capacity))
    nodes = leaf_indices + capacity
    tree = tree.at[nodes].set(values)
    for _ in range(levels):
        parents = nodes >> 1
        left = tree[2 * parents]
        right = tree[2 * parents + 1]
        tree = tree.at[parents].set(left + right)
        nodes = parents
    return tree


def total(tree: jax.Array) -> jax.Array:
    return tree[1]


def get(tree: jax.Array, leaf_indices: jax.Array) -> jax.Array:
    capacity = tree.shape[0] // 2
    return tree[leaf_indices + capacity]


def sample_from_prefix(tree: jax.Array, targets: jax.Array) -> jax.Array:
    """Find leaves by prefix-sum descent, vectorized over ``targets``.

    For each target u in [0, total), returns the leaf i such that
    ``sum(leaves[:i]) <= u < sum(leaves[:i+1])``.
    """
    capacity = tree.shape[0] // 2
    levels = int(math.log2(capacity))
    nodes = jnp.ones_like(targets, dtype=jnp.int32)
    u = targets
    for _ in range(levels):
        left = tree[2 * nodes]
        go_right = u >= left
        u = jnp.where(go_right, u - left, u)
        nodes = 2 * nodes + go_right.astype(jnp.int32)
    return nodes - capacity


def init_min_tree(capacity: int) -> jax.Array:
    """Min-tree twin (reference: MinTreeQueue, prioritized.py:233-258).

    Unwritten leaves are +inf so they never win the min.
    """
    assert capacity & (capacity - 1) == 0
    return jnp.full(2 * capacity, jnp.inf, jnp.float32)


def update_min(tree: jax.Array, leaf_indices: jax.Array, values: jax.Array) -> jax.Array:
    capacity = tree.shape[0] // 2
    levels = int(math.log2(capacity))
    nodes = leaf_indices + capacity
    tree = tree.at[nodes].set(values)
    for _ in range(levels):
        parents = nodes >> 1
        tree = tree.at[parents].set(
            jnp.minimum(tree[2 * parents], tree[2 * parents + 1])
        )
        nodes = parents
    return tree


def min_value(tree: jax.Array) -> jax.Array:
    return tree[1]


def stratified_targets(
    total_mass: jax.Array, rng: jax.Array, batch_size: int
) -> jax.Array:
    """One uniform draw per equal-mass segment of ``[0, total_mass)``."""
    bounds = jnp.linspace(0.0, 1.0, batch_size + 1)
    u = jax.random.uniform(rng, (batch_size,))
    targets = (bounds[:-1] + u * (bounds[1:] - bounds[:-1])) * total_mass
    # Guard the open upper end (u==1.0 would fall off the last leaf).
    return jnp.minimum(targets, total_mass * (1.0 - 1e-7))


def stratified_sample(
    tree: jax.Array, rng: jax.Array, batch_size: int
) -> jax.Array:
    """Stratified prefix-sum sampling: one draw per equal-mass segment.

    The reference avoids within-batch duplicates by temporarily removing
    sampled priorities (the wait-priority protocol,
    pfrl/collections/prioritized.py:98-116) — inherently sequential.
    Stratification achieves the same low-variance, low-duplicate sampling as
    one parallel gather (the PER paper's own scheme), so it is the
    TPU-native replacement.
    """
    return sample_from_prefix(tree, stratified_targets(total(tree), rng, batch_size))
