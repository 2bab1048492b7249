"""Shim module under the reference's ``pfrl.replay_buffer`` name.

Divergence note (documented for porters): the reference splits the replay
API across two namespaces — ``pfrl/replay_buffer.py`` holds the *abstract*
interface plus collation helpers (``AbstractReplayBuffer``,
``batch_experiences``, ``ReplayUpdater``; reference
pfrl/replay_buffer.py:15-356), while concrete buffers live under
``pfrl/replay_buffers/``. In this framework the buffers themselves are
stateless collation engines: ``ReplayBuffer.gather`` *is*
``batch_experiences`` (n-step fold at sample time,
pfrl_tpu/replay/uniform.py:188), and the reference's ``ReplayUpdater``
scheduling gate lives in the agent shells / device runner
(pfrl_tpu/agents/dqn.py, pfrl_tpu/experiments/runner.py). Both module
names — ``pfrl_tpu.replay_buffer`` (this shim) and
``pfrl_tpu.replay_buffers`` — re-export the full concrete API from
:mod:`pfrl_tpu.replay` so reference-style imports resolve either way.
"""

from pfrl_tpu.replay import *  # noqa: F401,F403
from pfrl_tpu.replay import __all__  # noqa: F401
