"""Global seeding (reference parity: pfrl/utils/random_seed.py:7-24).

The reference seeds ``random``/``numpy``/``torch`` globally. JAX is
functional — randomness flows through explicit ``jax.random`` keys — so here
we seed the host-side generators and hand back a root PRNG key that callers
thread through the functional core.
"""

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Seed python/numpy host RNGs and return a root jax PRNG key.

    Unlike the reference (which mutates torch's global RNG), device-side
    randomness in pfrl_tpu is always explicit: every jitted function takes a
    key derived from the returned root key.
    """
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)
