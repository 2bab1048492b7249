"""pfrl_tpu: a from-scratch TPU-native (JAX/XLA/pallas) deep RL framework.

Rebuilds the full capability surface of pfnet/pfrl (reference layer map in
SURVEY.md) as a functional, jit-first framework:

- pure functional algorithm cores: ``(state, batch) -> (state', metrics)``
- device-resident replay buffers with jitted insert/sample
- pure-JAX vectorized environments run under ``lax.scan`` (single on-device
  actor-learner loop), plus a host-env bridge for external (gym-style) envs
- a pfrl-compatible object shell (``Agent.act/observe/save/load``,
  ``experiments.train_agent_with_evaluation`` ...) layered on the core.

Reference parity targets: pfrl/agent.py, pfrl/env.py, pfrl/action_value.py.
"""

from pfrl_tpu import action_value  # noqa: F401
from pfrl_tpu import agent  # noqa: F401
from pfrl_tpu import agents  # noqa: F401
from pfrl_tpu import collections_  # noqa: F401
from pfrl_tpu import collections_ as collections  # noqa: F401  (pfrl name)
from pfrl_tpu import distributions  # noqa: F401
from pfrl_tpu import env  # noqa: F401
from pfrl_tpu import envs  # noqa: F401
from pfrl_tpu import explorer  # noqa: F401
from pfrl_tpu import explorers  # noqa: F401
from pfrl_tpu import experiments  # noqa: F401
from pfrl_tpu import functions  # noqa: F401
from pfrl_tpu import initializers  # noqa: F401
from pfrl_tpu import models  # noqa: F401
from pfrl_tpu import nn  # noqa: F401  (alias of models, pfrl familiarity)
from pfrl_tpu import ops  # noqa: F401
from pfrl_tpu import optimizers  # noqa: F401
from pfrl_tpu import parallel  # noqa: F401
from pfrl_tpu import policies  # noqa: F401
from pfrl_tpu import policy  # noqa: F401
from pfrl_tpu import q_function  # noqa: F401
from pfrl_tpu import q_functions  # noqa: F401
from pfrl_tpu import replay  # noqa: F401
from pfrl_tpu import replay_buffer  # noqa: F401  (pfrl name; real shim module)
from pfrl_tpu import replay_buffers  # noqa: F401  (alias of replay)
from pfrl_tpu import utils  # noqa: F401
from pfrl_tpu import wrappers  # noqa: F401

__version__ = "0.1.0"
