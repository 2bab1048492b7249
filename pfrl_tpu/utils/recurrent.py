"""Recurrent-state helpers (reference parity: pfrl/utils/recurrent.py:31-357).

The reference packs variable-length episodes into PackedSequence and walks
recurrent state trees with isinstance checks. Here sequences are padded to
static ``[T, B, ...]`` with boolean masks and unrolled under ``lax.scan``;
carries are plain pytrees so mask/select/detach are one-line tree ops.
"""

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from pfrl_tpu.utils.pytree import tree_where


def mask_recurrent_state_at(state: Any, mask: jax.Array, zero_state: Any) -> Any:
    """Reset carry rows where ``mask`` is True (episode boundary).

    Replaces the reference's ``mask_recurrent_state_at`` index-based surgery
    with a vectorized select.
    """
    return tree_where(mask, zero_state, state)


def one_step_forward(
    apply_fn: Callable, params: Any, x: Any, recurrent_state: Any
) -> Tuple[Any, Any]:
    """Single-step recurrent forward (pfrl/utils/recurrent.py:143-157)."""
    return apply_fn(params, x, recurrent_state)


def unroll(
    apply_fn: Callable,
    params: Any,
    xs: Any,
    initial_state: Any,
    resets: jax.Array = None,
) -> Tuple[Any, Any]:
    """Scan a recurrent model over time.

    Args:
        apply_fn: ``(params, x[B,...], carry) -> (y, carry)``.
        xs: time-major inputs ``[T, B, ...]``.
        initial_state: carry pytree ``[B, ...]``.
        resets: optional ``[T, B]`` bool; True resets the carry *before*
            consuming step t (truncated-BPTT episode boundaries).

    Returns ``(ys [T, B, ...], final_carry)``. This is the TPU-native
    replacement for ``pack_and_forward`` (pfrl/utils/recurrent.py:160-174):
    padding + masking instead of PackedSequence, and the whole unroll is one
    XLA while loop.
    """
    zero_state = jax.tree.map(jnp.zeros_like, initial_state)

    def body(carry, inp):
        if resets is None:
            x = inp
        else:
            x, reset_t = inp
            carry = tree_where(reset_t, zero_state, carry)
        y, carry = apply_fn(params, x, carry)
        return carry, y

    inputs = xs if resets is None else (xs, resets)
    final, ys = jax.lax.scan(body, initial_state, inputs)
    return ys, final


def flatten_sequences_time_first(seqs: Any) -> Any:
    """[T, B, ...] -> [T*B, ...] (pfrl/utils/recurrent.py:177-189)."""
    return jax.tree.map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), seqs
    )


def detach_recurrent_state(state: Any) -> Any:
    """Stop gradients flowing into stored carries (truncated BPTT)."""
    return jax.tree.map(jax.lax.stop_gradient, state)


def get_recurrent_state_at(state: Any, index, detach: bool = False) -> Any:
    out = jax.tree.map(lambda x: x[index], state)
    if detach:
        out = detach_recurrent_state(out)
    return out


def concatenate_recurrent_states(states) -> Any:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)
