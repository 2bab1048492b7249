"""Parameter-tree synchronization (reference parity: pfrl/utils/copy_param.py:4-42).

The reference mutates torch modules in place; here params are immutable
pytrees so "copy" returns the new tree and target-network sync is a pure
function the agent jits into its update step.
"""

from typing import Any

import jax
import jax.numpy as jnp


def copy_param(source: Any) -> Any:
    """Hard copy: returns ``source`` (immutable pytrees need no clone)."""
    return jax.tree.map(jnp.asarray, source)


def soft_copy_param(target: Any, source: Any, tau: float) -> Any:
    """Polyak averaging: ``target <- (1 - tau) * target + tau * source``.

    Matches pfrl/utils/copy_param.py:23-32 semantics.
    """
    return jax.tree.map(lambda t, s: (1.0 - tau) * t + tau * s, target, source)


def synchronize_parameters(src: Any, dst: Any, method: str = "hard", tau: float = 1e-2) -> Any:
    """Dispatch hard/soft sync (pfrl/utils/copy_param.py:35-42)."""
    if method == "hard":
        return copy_param(src)
    elif method == "soft":
        return soft_copy_param(dst, src, tau)
    raise ValueError(f"Unknown method {method!r}")
