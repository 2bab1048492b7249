"""Test helpers (reference parity: pfrl/testing.py).

The reference ships ``torch_assert_allclose``, an ``assert_allclose``
that first converts tensors / nested lists of tensors to numpy. The
JAX analog converts arbitrary pytrees of ``jax.Array`` leaves.
"""

import numpy as np

import jax


def _as_numpy_recursive(x):
    if isinstance(x, jax.Array):
        return np.asarray(jax.device_get(x))
    if isinstance(x, (list, tuple)):
        return np.asarray([_as_numpy_recursive(y) for y in x])
    return x


def jax_assert_allclose(actual, desired, *args, **kwargs):
    """``numpy.testing.assert_allclose`` that also accepts ``jax.Array``s
    and (possibly nested) lists/tuples of them (reference:
    pfrl/testing.py ``torch_assert_allclose``)."""
    actual = _as_numpy_recursive(actual)
    desired = _as_numpy_recursive(desired)
    np.testing.assert_allclose(actual, desired, *args, **kwargs)


def tree_assert_allclose(actual, desired, *args, **kwargs):
    """Leaf-wise ``assert_allclose`` over two pytrees with matching
    structure (the idiom the reference's helper is used for, extended to
    dict-bearing JAX pytrees like flax param trees)."""
    jax.tree.map(
        lambda a, b: jax_assert_allclose(a, b, *args, **kwargs),
        actual,
        desired,
    )
