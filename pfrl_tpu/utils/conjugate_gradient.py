"""Jitted conjugate gradient (reference parity: pfrl/utils/conjugate_gradient.py:4-33).

Used by TRPO to solve ``A x = b`` where ``A`` is the Fisher-vector-product
operator. The reference loops in Python on torch tensors; here the loop is a
``lax.fori_loop`` so the whole CG solve stays inside one XLA computation
(A_product_func must be jit-traceable).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def conjugate_gradient(
    A_product_func: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    tol: float = 1e-10,
    max_iter: int = 10,
) -> jax.Array:
    """Solve ``A x = b`` by CG with a fixed iteration budget.

    The tolerance check is folded in by freezing the iterate once the
    residual is small (no data-dependent early exit under jit).
    """
    x0 = jnp.zeros_like(b)
    r0 = b - A_product_func(x0)

    def body(_, carry):
        x, r, p, rr = carry
        ap = A_product_func(p)
        alpha = rr / (jnp.vdot(p, ap) + 1e-38)
        x_new = x + alpha * p
        r_new = r - alpha * ap
        rr_new = jnp.vdot(r_new, r_new)
        beta = rr_new / (rr + 1e-38)
        p_new = r_new + beta * p
        # Freeze once converged (branchless early-exit).
        done = rr < tol
        x = jnp.where(done, x, x_new)
        r = jnp.where(done, r, r_new)
        p = jnp.where(done, p, p_new)
        rr = jnp.where(done, rr, rr_new)
        return (x, r, p, rr)

    x, _, _, _ = jax.lax.fori_loop(
        0, max_iter, body, (x0, r0, r0, jnp.vdot(r0, r0))
    )
    return x
