"""Mixed-precision helpers: bf16 compute over fp32 master params.

The TPU-native training recipe (no reference counterpart — pfrl trains
fp32 on GPU): parameters, optimizer state, and loss math stay float32;
the network forward/backward (where the MXU FLOPs are) runs in bfloat16
by casting params and inputs at the apply boundary. Gradients are taken
with respect to the float32 masters — the cast is part of the traced
computation, so XLA emits bf16 convs/matmuls with fp32 accumulation and
the optimizer sees full-precision updates.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype: Optional[Any]) -> Any:
    """Cast floating-point leaves to ``dtype`` (None = no-op).

    Non-float leaves (uint8 frames, int actions, bool flags) pass through.
    """
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.result_type(x), jnp.floating)
        and jnp.result_type(x) != dtype
        else x,
        tree,
    )


def apply_cast(
    module, params, dtype: Optional[Any], *args, uncast_argnums=(), **kwargs
) -> Any:
    """Run ``module.apply`` with bf16 (or any ``dtype``) compute.

    Floating leaves of ``params`` and the positional inputs are cast down
    at the apply boundary and the output pytree is cast back to float32,
    so callers' loss/TD math stays full precision. ``dtype=None`` is the
    plain fp32 apply. The casts are part of the traced computation, so
    gradients flow back to the float32 masters (the down-cast's VJP is an
    up-cast) and XLA emits bf16 convs/matmuls with fp32 accumulation.

    .. warning:: EVERY floating positional arg is down-cast unless its
       index is listed in ``uncast_argnums``. Precision-sensitive inputs —
       recurrent carries that must stay fp32 across long scans, running
       statistics, step counters stored as floats — must either be listed
       there or be passed via ``kwargs`` (keyword args are never cast).
       The recurrent cores (RecurrentDQN/RecurrentPPO) instead call
       ``cast_floating`` selectively per input so their fp32 carries are
       never routed through this helper's blanket cast.
    """
    if dtype is None:
        return module.apply(params, *args, **kwargs)
    out = module.apply(
        cast_floating(params, dtype),
        *(
            a if i in uncast_argnums else cast_floating(a, dtype)
            for i, a in enumerate(args)
        ),
        **kwargs,
    )
    return cast_to_float32(out)


def cast_to_float32(tree: Any) -> Any:
    """Cast low-precision floating leaves back up to float32 (for loss
    math, TD targets, and anything numerically delicate)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(jnp.result_type(x), jnp.floating)
        and jnp.result_type(x) != jnp.float32
        else x,
        tree,
    )
