"""Alias of :mod:`pfrl_tpu.replay` under the reference's name (pfrl/replay_buffers)."""

from pfrl_tpu.replay import *  # noqa: F401,F403
from pfrl_tpu.replay import __all__  # noqa: F401
