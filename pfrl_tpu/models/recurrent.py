"""Recurrent model containers.

Reference parity: pfrl/nn/recurrent.py:16-30 (Recurrent protocol),
pfrl/nn/recurrent_sequential.py:26-62 (auto-wrapping container). The
reference threads ``torch.nn.utils.rnn.PackedSequence`` through LSTM layers;
the TPU-native equivalent is **padded, masked, statically-shaped** sequences
unrolled with ``lax.scan`` (see pfrl_tpu/utils/recurrent.py), with carries
reset at episode boundaries by masking — no ragged shapes ever reach XLA.

Every recurrent module here exposes:
  - ``initial_carry(batch_size)``: zero carry pytree
  - ``__call__(x, carry)``: one step ``[B, ...] -> ([B, ...], new_carry)``
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMCellModule(nn.Module):
    """Single LSTM layer with the one-step carry protocol."""

    features: int

    @nn.nowrap
    def initial_carry(self, batch_size: int) -> Any:
        shape = (batch_size, self.features)
        return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))

    @nn.compact
    def __call__(self, x: jax.Array, carry: Any) -> Tuple[jax.Array, Any]:
        cell = nn.OptimizedLSTMCell(self.features)
        new_carry, y = cell(carry, x)
        return y, new_carry


class GRUCellModule(nn.Module):
    """Single GRU layer with the one-step carry protocol."""

    features: int

    @nn.nowrap
    def initial_carry(self, batch_size: int) -> Any:
        return jnp.zeros((batch_size, self.features), jnp.float32)

    @nn.compact
    def __call__(self, x: jax.Array, carry: Any) -> Tuple[jax.Array, Any]:
        cell = nn.GRUCell(self.features)
        new_carry, y = cell(carry, x)
        return y, new_carry


def is_recurrent(module: Any) -> bool:
    return hasattr(module, "initial_carry")


class RecurrentBranched(nn.Module):
    """Parallel recurrent branches over the same input
    (reference parity: pfrl/nn/recurrent_branched.py:6-28).

    Carry is a tuple of each branch's carry; output is the tuple of branch
    outputs.
    """

    branches: Sequence[Any]

    @nn.nowrap
    def initial_carry(self, batch_size: int) -> Tuple:
        return tuple(
            b.initial_carry(batch_size) if is_recurrent(b) else ()
            for b in self.branches
        )

    @nn.compact
    def __call__(self, x: Any, carry: Tuple) -> Tuple[Tuple, Tuple]:
        outs = []
        new_carries = []
        for branch, c in zip(self.branches, carry):
            if is_recurrent(branch):
                y, nc = branch(x, c)
            else:
                y, nc = branch(x), ()
            outs.append(y)
            new_carries.append(nc)
        return tuple(outs), tuple(new_carries)


class RecurrentSequential(nn.Module):
    """Sequential container mixing stateless and recurrent layers.

    Carry is a tuple with one entry per *recurrent* layer (stateless layers
    contribute nothing), mirroring the reference's RecurrentSequential
    recurrent_children bookkeeping (recurrent_sequential.py:26-44).
    """

    layers: Sequence[Any]

    @nn.nowrap
    def initial_carry(self, batch_size: int) -> Tuple:
        return tuple(
            layer.initial_carry(batch_size)
            for layer in self.layers
            if is_recurrent(layer)
        )

    @nn.compact
    def __call__(self, x: Any, carry: Tuple) -> Tuple[Any, Tuple]:
        new_carries = []
        idx = 0
        for layer in self.layers:
            if is_recurrent(layer):
                x, c = layer(x, carry[idx])
                new_carries.append(c)
                idx += 1
            else:
                x = layer(x)
        return x, tuple(new_carries)
