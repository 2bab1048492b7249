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
        return [_as_numpy_recursive(y) for y in x]
    return x


def jax_assert_allclose(actual, desired, *args, **kwargs):
    """``numpy.testing.assert_allclose`` accepting ``jax.Array``s and
    nested lists/tuples of them; ragged nests compare element-wise.

    Reference: pfrl/testing.py ``torch_assert_allclose``. Dict inputs
    (e.g. flax param trees) are rejected with a pointer to
    :func:`tree_assert_allclose`, which asserts structure too.
    """
    if isinstance(actual, dict) or isinstance(desired, dict):
        raise TypeError(
            "jax_assert_allclose does not accept dicts; use "
            "tree_assert_allclose for dict-bearing pytrees (it also "
            "checks tree structure)"
        )
    actual = _as_numpy_recursive(actual)
    desired = _as_numpy_recursive(desired)
    _assert_allclose_nested(actual, desired, *args, **kwargs)


def _assert_allclose_nested(actual, desired, *args, **kwargs):
    # Element-wise recursion so ragged nests (sub-arrays of differing
    # shapes, which np.asarray rejects on numpy>=1.24) still compare.
    a_seq = isinstance(actual, list)
    d_seq = isinstance(desired, list)
    if a_seq or d_seq:
        a = list(actual) if a_seq else [actual]
        d = list(desired) if d_seq else [desired]
        if a_seq and d_seq and len(a) != len(d):
            raise AssertionError(
                f"length mismatch: {len(a)} vs {len(d)}"
            )
        if not (a_seq and d_seq):
            # One side scalar/array, other a list: broadcast the lone side.
            n = max(len(a), len(d))
            a = a * n if len(a) == 1 else a
            d = d * n if len(d) == 1 else d
        for x, y in zip(a, d):
            _assert_allclose_nested(x, y, *args, **kwargs)
        return
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
