"""Factorized NoisyNet linear layer.

Reference parity: pfrl/nn/noisy_linear.py:25-70 (factorized Gaussian noise
``f(x) = sign(x) * sqrt(|x|)``) and pfrl/nn/noisy_chain.py:10-36
(``to_factorized_noisy`` module rewrite). Noise is drawn from the linen
``'noise'`` RNG stream each call, so one jitted update resamples exactly once
per forward — same semantics as the reference's per-forward sampling, but as
pure function of the key.
"""

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu import initializers


def _f(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


class FactorizedNoisyDense(nn.Module):
    """Dense layer with factorized Gaussian parameter noise.

    sigma_scale matches the reference default 0.4; mu is initialized
    LeCun-uniform-style via variance scaling over fan-in.
    """

    features: int
    sigma_scale: float = 0.4

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = False) -> jax.Array:
        in_features = x.shape[-1]
        # Reference init (noisy_linear.py:36-44): mu ~ LeCunUniform-ish
        # (uniform bound sqrt(3/fan_in)), sigma = sigma_scale / sqrt(fan_in).
        mu_init = jax.nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"
        )
        w_mu = self.param("w_mu", mu_init, (in_features, self.features))
        b_mu = self.param(
            "b_mu",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0, maxval=1.0
            )
            * (3.0 / in_features) ** 0.5,
            (self.features,),
        )
        sigma0 = self.sigma_scale / in_features**0.5
        w_sigma = self.param(
            "w_sigma", initializers.constant_bias(sigma0), (in_features, self.features)
        )
        b_sigma = self.param(
            "b_sigma", initializers.constant_bias(sigma0), (self.features,)
        )

        if deterministic:
            return x @ w_mu + b_mu

        rng = self.make_rng("noise")
        k_in, k_out = jax.random.split(rng)
        eps_in = _f(jax.random.normal(k_in, (in_features,)))
        eps_out = _f(jax.random.normal(k_out, (self.features,)))
        w = w_mu + w_sigma * jnp.outer(eps_in, eps_out)
        b = b_mu + b_sigma * eps_out
        return x @ w + b


def to_factorized_noisy(module_cls: Callable[..., Any], sigma_scale: float = 0.4):
    """Return a patched constructor where ``nn.Dense`` becomes noisy.

    The reference walks a live torch module tree replacing nn.Linear
    (noisy_chain.py:10-36). linen modules are declarative, so the rewrite is
    a construction-time substitution: model zoo classes accept a
    ``dense_cls`` factory, and this helper builds the noisy factory.
    """

    def factory(features, **kwargs):
        kwargs.pop("kernel_init", None)
        kwargs.pop("bias_init", None)
        return FactorizedNoisyDense(features=features, sigma_scale=sigma_scale)

    del module_cls
    return factory
