"""Cross-distribution helpers."""

from pfrl_tpu.distributions.categorical import Categorical
from pfrl_tpu.distributions.normal import Normal


def kl_divergence(p, q):
    """KL(p || q) for matching distribution families (Categorical, Normal).

    Replaces ``torch.distributions.kl_divergence`` dispatch used by ACER/TRPO
    in the reference.
    """
    if isinstance(p, Categorical) and isinstance(q, Categorical):
        return p.kl(q)
    if isinstance(p, Normal) and isinstance(q, Normal):
        return p.kl(q)
    raise NotImplementedError(
        f"kl_divergence not defined for {type(p).__name__} vs {type(q).__name__}"
    )
