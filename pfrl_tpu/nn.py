"""Alias of :mod:`pfrl_tpu.models` under the reference's name (pfrl/nn)."""

from pfrl_tpu.models import *  # noqa: F401,F403
from pfrl_tpu.models import __all__  # noqa: F401
