"""Build lower-triangular matrices from packed entries.

Reference parity: pfrl/functions/lower_triangular_matrix.py:19-28 — used by
the NAF quadratic Q-function to parameterize a PSD matrix via its Cholesky
factor. Implemented as a scatter into the static tril index set, which XLA
lowers to a single gather/scatter pair.
"""

import jax
import jax.numpy as jnp
import numpy as np


def lower_triangular_matrix(diag: jax.Array, non_diag: jax.Array) -> jax.Array:
    """Assemble ``[B, n, n]`` lower-triangular matrices.

    Args:
        diag: ``[B, n]`` diagonal entries.
        non_diag: ``[B, n*(n-1)/2]`` strictly-lower entries, row-major.
    """
    n = diag.shape[-1]
    batch = diag.shape[0]
    rows, cols = np.tril_indices(n, -1)
    out = jnp.zeros((batch, n, n), diag.dtype)
    out = out.at[:, rows, cols].set(non_diag)
    idx = np.arange(n)
    out = out.at[:, idx, idx].set(diag)
    return out
