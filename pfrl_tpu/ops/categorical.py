"""C51 categorical projection.

Reference parity: pfrl/agents/categorical_dqn.py:7-57 (Algorithm 1 of the
C51 paper). The reference does two flat scatter_adds; here the projection is
expressed as a dense ``[B, n_atoms, n_atoms]`` weight tensor contracted with
the source probabilities — an einsum the MXU eats directly, with no scatter
at all (n_atoms=51, so the weight tensor is tiny and fuses with the
surrounding loss).
"""

import jax
import jax.numpy as jnp


def categorical_projection(
    y: jax.Array, y_probs: jax.Array, z: jax.Array
) -> jax.Array:
    """Project atom values ``y`` with probs ``y_probs`` onto support ``z``.

    Args:
        y: ``[B, n_atoms]`` atom values before projection (e.g. r + gamma*z).
        y_probs: ``[B, n_atoms]`` probabilities of those atoms.
        z: ``[n_atoms]`` target support, sorted, evenly spaced.

    Returns ``[B, n_atoms]`` projected probabilities. The l==u integer case
    follows the reference's ``1 - (bj - l)`` trick, so outputs match the
    torch scatter_add implementation bit-for-bit in float32.
    """
    n_atoms = z.shape[0]
    delta_z = z[1] - z[0]
    v_min, v_max = z[0], z[-1]
    y = jnp.clip(y, v_min, v_max)
    bj = jnp.clip((y - v_min) / delta_z, 0.0, n_atoms - 1)
    low = jnp.floor(bj)
    up = jnp.ceil(bj)
    w_low = y_probs * (1.0 - (bj - low))  # mass to floor atom
    w_up = y_probs * (bj - low)           # mass to ceil atom

    # One-hot contraction instead of scatter: weights [B, src, tgt].
    atoms = jnp.arange(n_atoms, dtype=bj.dtype)
    onehot_low = (low[..., None] == atoms).astype(y_probs.dtype)
    onehot_up = (up[..., None] == atoms).astype(y_probs.dtype)
    return jnp.einsum("bs,bst->bt", w_low, onehot_low) + jnp.einsum(
        "bs,bst->bt", w_up, onehot_up
    )
