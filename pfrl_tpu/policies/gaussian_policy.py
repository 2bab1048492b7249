"""Gaussian policy heads (reference parity: pfrl/policies/gaussian_policy.py:6-120)."""

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu.distributions import Normal, SquashedNormal


class GaussianHeadWithStateIndependentCovariance(nn.Module):
    """Mean from input; log-std is a learned state-independent parameter.

    Matches the head PPO/TRPO reproductions use
    (gaussian_policy.py:43-78 with var_func=exp on a learned var_param).
    """

    action_size: int
    var_type: str = "spherical"  # or "diagonal"
    init_log_std: float = 0.0

    @nn.compact
    def __call__(self, mean: jax.Array) -> Normal:
        n = 1 if self.var_type == "spherical" else self.action_size
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.init_log_std, jnp.float32),
            (n,),
        )
        scale = jnp.broadcast_to(jnp.exp(log_std), mean.shape)
        return Normal(loc=mean, scale=scale)


class GaussianHeadWithDiagonalCovariance(nn.Module):
    """Input is (mean, pre-scale) concatenated; scale via softplus.

    Reference: gaussian_policy.py:81-103.
    """

    var_func: Callable = jax.nn.softplus

    def __call__(self, mean_and_var: jax.Array) -> Normal:
        mean, pre = jnp.split(mean_and_var, 2, axis=-1)
        return Normal(loc=mean, scale=jnp.sqrt(self.var_func(pre) + 1e-8))


class GaussianHeadWithFixedCovariance(nn.Module):
    """Fixed scalar std (reference: gaussian_policy.py:106-120)."""

    scale: float = 1.0

    def __call__(self, mean: jax.Array) -> Normal:
        return Normal(loc=mean, scale=jnp.full_like(mean, self.scale))


class SquashedGaussianHead(nn.Module):
    """Tanh-squashed Gaussian head for SAC.

    Input is ``[B, 2*action_size]`` (mean ++ log_std); log_std clipped to the
    usual [-20, 2] band. The reference builds the same thing inline in the
    SAC examples via TransformedDistribution.
    """

    action_size: int
    log_std_min: float = -20.0
    log_std_max: float = 2.0

    def __call__(self, out: jax.Array) -> SquashedNormal:
        mean, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return SquashedNormal(loc=mean, scale=jnp.exp(log_std))
