"""Multi-chip scale-out over jax.sharding meshes.

Replaces the reference's parallelism surface (SURVEY.md §2.6: process-pool
vector envs, shared-memory async gradients, actor-learner pipes) with SPMD:
env lanes shard over a device mesh, the learner update runs under
``shard_map``/``pjit`` with gradient ``pmean`` riding ICI.
"""

from pfrl_tpu.parallel.mesh import make_mesh, shard_batch
from pfrl_tpu.parallel.data_parallel import data_parallel_update
from pfrl_tpu.parallel.inference_server import BatchedInferenceServer
from pfrl_tpu.parallel.multihost import (
    global_mesh,
    initialize_multihost,
    is_primary,
    local_lane_slice,
)

__all__ = [
    "global_mesh",
    "initialize_multihost",
    "is_primary",
    "local_lane_slice",
    "make_mesh",
    "shard_batch",
    "data_parallel_update",
    "BatchedInferenceServer",
]
