"""Implicit quantile Q-function (IQN).

Reference parity: pfrl/agents/iqn.py:83-124 (psi/phi/f factorization):
``quantiles(x, tau) = f(psi(x) * phi(tau))`` with phi = ReLU(Dense(cos-basis)).
The [B, n_taus, d] elementwise product + batched dense head are pure MXU/VPU
work batched over taus.
"""

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from pfrl_tpu import initializers
from pfrl_tpu.action_value import QuantileDiscreteActionValue
from pfrl_tpu.ops.quantile import cosine_basis_functions


class ImplicitQuantileQFunction(nn.Module):
    """psi: obs -> [B, d]; phi embeds taus; f heads to actions.

    ``psi`` is any feature module (e.g. LargeAtariCNN or an MLP torso).
    """

    psi: nn.Module
    n_actions: int
    n_basis_functions: int = 64
    hidden_size: int = None  # inferred from psi output if None

    @nn.compact
    def __call__(self, x: jax.Array, taus: jax.Array) -> QuantileDiscreteActionValue:
        """x: [B, ...]; taus: [B, n_taus] -> quantiles [B, n_taus, A]."""
        h = self.psi(x)  # [B, d]
        d = h.shape[-1]
        basis = cosine_basis_functions(taus, self.n_basis_functions)  # [B,n,64]
        phi = nn.Dense(
            d,
            kernel_init=initializers.chainer_default_w(),
            bias_init=initializers.zeros,
        )(basis)
        phi = nn.relu(phi)  # [B, n, d]
        hprod = h[:, None, :] * phi  # [B, n, d]
        q = nn.Dense(
            self.n_actions,
            kernel_init=initializers.chainer_default_w(),
            bias_init=initializers.zeros,
        )(hprod)  # [B, n, A]
        return QuantileDiscreteActionValue(quantiles=q)


class RecurrentImplicitQuantileQFunction(nn.Module):
    """Recurrent IQN: psi carries memory across steps.

    Reference parity: pfrl/agents/iqn.py:127-173
    (RecurrentImplicitQuantileQFunction). ``psi`` follows the recurrent
    module protocol (pfrl_tpu/models/recurrent.py): ``psi(x, carry) ->
    ([B, d], new_carry)`` plus ``initial_carry(batch_size)``. The tau
    embedding and head are identical to the feed-forward variant; only the
    feature extractor is stateful.
    """

    psi: nn.Module
    n_actions: int
    n_basis_functions: int = 64

    @nn.nowrap
    def initial_carry(self, batch_size: int):
        return self.psi.initial_carry(batch_size)

    @nn.compact
    def __call__(self, x: jax.Array, taus: jax.Array, carry):
        """x: [B, ...]; taus: [B, n_taus] -> (quantiles [B,n,A], carry)."""
        h, new_carry = self.psi(x, carry)  # [B, d]
        d = h.shape[-1]
        basis = cosine_basis_functions(taus, self.n_basis_functions)
        phi = nn.Dense(
            d,
            kernel_init=initializers.chainer_default_w(),
            bias_init=initializers.zeros,
        )(basis)
        phi = nn.relu(phi)  # [B, n, d]
        q = nn.Dense(
            self.n_actions,
            kernel_init=initializers.chainer_default_w(),
            bias_init=initializers.zeros,
        )(h[:, None, :] * phi)  # [B, n, A]
        return QuantileDiscreteActionValue(quantiles=q), new_carry
