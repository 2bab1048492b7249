"""Optimizers (reference parity: pfrl/optimizers/).

optax plays torch.optim's role. The one custom piece the reference carries —
RMSprop with epsilon added *inside* the sqrt (Nature-DQN fidelity,
pfrl/optimizers/rmsprop_eps_inside_sqrt.py:5-83) — is provided as an optax
GradientTransformation.
"""

from pfrl_tpu.optimizers.rmsprop_eps_inside_sqrt import rmsprop_eps_inside_sqrt

__all__ = ["rmsprop_eps_inside_sqrt"]
